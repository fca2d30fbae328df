#!/usr/bin/env python
"""Layered (row-layered) min-sum serving artifacts → results/tpu/ldpc_layered.json.

VERDICT r3 item 6: the LDPC serving lever — row-layered scheduling converges
in roughly half the flooding iterations, so at iteration-bound operating
points it is a ~2× end-to-end lever.  Stages (each prints as it lands):

  1. n=504: flooding NMS vs layered NMS throughput through the fused Pallas
     kernels (bench.bench_ldpc_bp harness — chained on-chip, on-device BER)
     at 3 dB (the bench point) and 1.5 dB (iteration-bound).
  2. n=504: per-frame iteration stats at the same points.
  3. n=504: error-rate parity sweep flooding vs layered (host-staged, errors
     on device).
  4. n=8192 QC: flooding vs layered through the roll path
     (tools/large_code_runs.run_ldpc8192) at −1.0 dB (avg ~10.5 flooding
     iterations per the committed curve) and 3 dB.

Flooding stays the reference-exact default everywhere; layered semantics
are pinned by ``parity/ldpc_np.layered_ms_decode_np`` (tests).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "results" / "tpu"


def _log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    import bench
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    out: dict = {"device": str(jax.devices()[0])}
    OUT.mkdir(parents=True, exist_ok=True)

    def _save():
        (OUT / "ldpc_layered.json").write_text(json.dumps(out, indent=2))

    # --- stage 1+2: n=504 kernel throughput + iteration stats -------------
    enc = fec.LDPCEncoder(504, 252, dv=3, dc=6, seed=42)
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, 2, (8192, enc.k)).astype(np.int8)
    cw = (msgs.astype(np.int64) @ np.asarray(enc.G)) % 2
    out["n504"] = {}
    for snr in (3.0, 1.5):
        llr = jnp.asarray(awgn_llr_np(cw, snr,
                                      rng.standard_normal(cw.shape))
                          .astype(np.float32))
        point = {}
        # num_layers=2 keeps the layer-major P tensor inside the kernel's
        # VMEM budget at n=504 (2·dv·dc·n·128·4B ≈ 9.3 MB; 4 layers would
        # need 18.6) — the kernel is the point of the serving artifact
        for name, dec_kind in (("flooding_nms", "nms"),
                               ("layered_nms", "layered-nms")):
            r = bench.bench_ldpc_bp(decoder=dec_kind, snr_db=snr,
                                    num_layers=2)
            d = (fec.NMSDecoder(enc.H, max_iter=20, impl="auto")
                 if dec_kind == "nms" else
                 fec.LayeredMSDecoder(enc.H, max_iter=20, normalization=0.75,
                                      impl="auto", num_layers=2))
            bits, iters = d.decode(llr, return_iterations=True)
            iters = np.asarray(iters)
            point[name] = {
                "mbps": round(r["mbps"], 1),
                "impl": r["bp_impl"],
                "ber_bench": r["ber_3db"],
                "avg_iterations": round(float(iters.mean()), 3),
                "p95_iterations": int(np.percentile(iters, 95)),
            }
            _log(f"n504 @{snr} dB {name}: {r['mbps']:.1f} Mbps, "
                 f"avg_iters {iters.mean():.2f}")
        point["speedup"] = round(point["layered_nms"]["mbps"]
                                 / point["flooding_nms"]["mbps"], 3)
        out["n504"][f"snr_{snr}"] = point
        _save()

    # --- stage 3: n=504 error-rate parity sweep ---------------------------
    sweep = {"snr_db": [], "flooding": [], "layered": []}
    nfr = 20000
    msgs_s = rng.integers(0, 2, (nfr, enc.k)).astype(np.int8)
    cw_s = (msgs_s.astype(np.int64) @ np.asarray(enc.G)) % 2
    d_f = fec.NMSDecoder(enc.H, max_iter=20, impl="auto")
    d_l = fec.LayeredMSDecoder(enc.H, max_iter=20, normalization=0.75,
                               impl="auto", num_layers=2)
    info_idx = np.asarray(enc.info_positions)
    for snr in (0.0, 0.5, 1.0, 1.5, 2.0):
        llr = jnp.asarray(awgn_llr_np(cw_s, snr,
                                      rng.standard_normal(cw_s.shape))
                          .astype(np.float32))
        row = {}
        for nm, d in (("flooding", d_f), ("layered", d_l)):
            bits = np.asarray(d.decode(llr))
            diff = bits[:, info_idx] != msgs_s
            row[nm] = {"ber": float(diff.mean()),
                       "fer": float(diff.any(1).mean())}
        sweep["snr_db"].append(snr)
        sweep["flooding"].append(row["flooding"])
        sweep["layered"].append(row["layered"])
        _log(f"n504 parity @{snr} dB: flood fer {row['flooding']['fer']:.4f} "
             f"vs layered {row['layered']['fer']:.4f}")
    out["n504_parity_sweep"] = {"frames_per_point": nfr, **sweep}
    _save()

    # --- stage 4: n=8192 QC roll path --------------------------------------
    from tools.large_code_runs import run_ldpc8192

    out["n8192"] = {}
    for snr in (-1.0, 3.0):
        point = {}
        for name, sched in (("flooding_nms", "flooding"),
                            ("layered_nms", "layered")):
            t0 = time.time()
            r = run_ldpc8192(512, 0, snr_db=snr, scan_chunks=8,
                             variant="nms", schedule=sched,
                             normalization=0.75)
            point[name] = {
                "mbps": round(r["decoded_info_mbps"], 1),
                "avg_iterations": round(r["avg_iterations"], 3),
                "ber": r["ber"], "fer": r["fer"],
                "compile_seconds": round(r["compile_seconds"], 1),
            }
            _log(f"n8192 @{snr} dB {name}: "
                 f"{r['decoded_info_mbps']:.1f} Mbps, "
                 f"avg_iters {r['avg_iterations']:.2f} "
                 f"({time.time()-t0:.0f}s)")
        point["speedup"] = round(point["layered_nms"]["mbps"]
                                 / point["flooding_nms"]["mbps"], 3)
        out["n8192"][f"snr_{snr}"] = point
        _save()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
