#!/usr/bin/env python
"""Separate the min-sum/BP throughput gap into per-iteration kernel cost
vs convergence (iteration count) — VERDICT r3 item 4.

Round-3 measured NMS (α=0.75) at 414 Mbps vs sum-product BP at 761 Mbps on
the same n=504 code at 3 dB, although min-sum is strictly cheaper per
iteration.  This probe decomposes the gap:

  stage 1 — avg_iterations at 3 dB (early-stop decode, batch 8192): the
            convergence side.  Includes an α sweep for NMS.
  stage 2 — per-iteration kernel cost: the same fused Pallas kernel built
            with ``early_stop=False`` (fixed 20 iterations, no syndrome
            latching divergence between frames), scan-chained on-chip →
            ms per iteration per batch.  The kernel-cost side.
  stage 3 — reconciliation: predicted throughput ratio from
            (ms/iter × avg_iters) vs the measured bench ratio.

Writes ``results/tpu/minsum_gap_probe.json``.

Reference min-sum semantics: ``/root/reference/src/ldpc/decoder.py:257-287``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _awgn_llrs_host(cw: np.ndarray, snr_db: float, seed: int) -> np.ndarray:
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    noise = np.random.default_rng(seed).standard_normal(cw.shape)
    return awgn_llr_np(cw, snr_db, noise).astype(np.float32)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.ops.bp_pallas import make_bp_decoder_pallas
    from polarcode_and_ldpc_tpu.sim.throughput import _force

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    n, k, snr_db = 504, 252, 3.0
    enc = fec.LDPCEncoder(n, k, dv=3, dc=6, seed=42)
    out: dict = {"n": n, "k": k, "snr_db": snr_db, "max_iter": 20,
                 "device": str(dev)}

    rng = np.random.default_rng(11)
    B = 8192
    msgs = rng.integers(0, 2, (B, enc.k)).astype(np.int8)
    cw = (msgs.astype(np.int64) @ np.asarray(enc.G)) % 2
    llr = jnp.asarray(_awgn_llrs_host(cw, snr_db, seed=13))

    # --- stage 1: convergence (avg iterations at 3 dB, early stop) --------
    variants = [("bp", dict(check_rule="bp")),
                ("nms_a0.75", dict(check_rule="ms", normalization=0.75)),
                ("nms_a0.875", dict(check_rule="ms", normalization=0.875)),
                ("nms_a1.0", dict(check_rule="ms", normalization=1.0)),
                ("oms_b0.5", dict(check_rule="ms", offset=0.5))]
    from polarcode_and_ldpc_tpu.models.ldpc.graph import TannerGraph

    graph = TannerGraph.from_H(enc.H)
    out["stage1_avg_iters"] = {}
    for name, kw in variants:
        fn = make_bp_decoder_pallas(graph, 20, True, **kw)
        t0 = time.time()
        bits, iters = jax.block_until_ready(jax.jit(fn)(llr))
        iters = np.asarray(iters)
        bits = np.asarray(bits)
        ber = float((bits[:, enc.info_positions] != msgs).mean())
        out["stage1_avg_iters"][name] = {
            "avg_iters": round(float(iters.mean()), 3),
            "p95_iters": int(np.percentile(iters, 95)),
            "frac_maxed": round(float((iters == 20).mean()), 5),
            "ber_3db": ber,
        }
        print(f"stage1 {name}: avg_iters={iters.mean():.2f} "
              f"p95={int(np.percentile(iters, 95))} ber={ber:.2e} "
              f"({time.time()-t0:.1f}s)", flush=True)

    # --- stage 2: per-iteration kernel cost (fixed 20 iters, chained) -----
    scan_chunks = 8
    out["stage2_per_iter_ms"] = {}
    for name, kw in [("bp", dict(check_rule="bp")),
                     ("nms_a0.75", dict(check_rule="ms", normalization=0.75))]:
        fn = make_bp_decoder_pallas(graph, 20, False, **kw)

        @jax.jit
        def chained(x):
            def step(_, xx):
                bits, _it = fn(xx)
                return None, jnp.sum(bits, dtype=jnp.int32)
            return jnp.sum(lax.scan(
                step, None, jnp.broadcast_to(x, (scan_chunks, B, n)))[1])

        t0 = time.time()
        _force(chained(llr))
        print(f"stage2 {name}: compile {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = chained(llr)
            _force(o)
            best = min(best, time.perf_counter() - t0)
        per_iter_ms = best / scan_chunks / 20 * 1e3
        out["stage2_per_iter_ms"][name] = round(per_iter_ms, 4)
        print(f"stage2 {name}: {per_iter_ms:.3f} ms/iter per {B}-frame batch",
              flush=True)

    # --- stage 3: reconciliation ------------------------------------------
    s1, s2 = out["stage1_avg_iters"], out["stage2_per_iter_ms"]
    pred = {}
    for name in ("bp", "nms_a0.75"):
        pred[name] = s2[name] * s1[name]["avg_iters"]
    out["stage3_reconciliation"] = {
        "predicted_decode_ms": {k: round(v, 3) for k, v in pred.items()},
        "predicted_bp_over_nms_speedup": round(pred["nms_a0.75"] / pred["bp"], 3),
        "note": ("if predicted ratio ~ measured bench ratio (761/414 = 1.84), "
                 "the gap is convergence x per-iter cost as decomposed here"),
    }
    print(json.dumps(out["stage3_reconciliation"], indent=1), flush=True)

    path = Path(__file__).resolve().parents[1] / "results/tpu/minsum_gap_probe.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
