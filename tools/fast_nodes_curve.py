#!/usr/bin/env python
"""Exact-vs-fast SCL error-rate characterization (VERDICT r2 next-step
#2c): CA-SCL-8 N=1024 BER/FER curves with ``node_mode="exact"`` vs
``node_mode="fast"`` (SSCL fast list nodes) down to FER ~1e-5, so the
approximate serving mode's error cost is quantified instead of asserted.

Methodology mirrors the reference's decoder A/B
(``/root/reference/benchmarks/sc_vs_scl.py:203-349``): same frames, same
noise (per-frame RNG keyed by global frame id), same early-stop
accounting; one runtime-SNR compile per decoder serves every point.

Writes results/tpu/fast_nodes_curve.json + results/figures/
fast_nodes_curve.png.

Usage: python tools/fast_nodes_curve.py [--frames 10000000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = Path(__file__).resolve().parents[1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=10_000_000)
    ap.add_argument("--max-errors", type=int, default=500)
    ap.add_argument("--snrs", default="0.5,1.0,1.5,2.0,2.5,3.0")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--chunks-per-dispatch", type=int, default=8)
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.sim import make_polar_pipeline, run_snr_sweep

    N, K, L = 1024, 512, 8
    frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    snrs = [float(s) for s in args.snrs.split(",")]
    on_tpu = not args.cpu
    out = {"config": {"N": N, "K": K, "list_size": L, "decoder": "ca-scl",
                      "crc": "CRC-8", "snr_db": snrs,
                      "num_frames": args.frames,
                      "max_errors": args.max_errors},
           "note": ("same frames and noise per point in both arms "
                    "(per-frame RNG keyed by global frame id); fast = SSCL "
                    "fast list nodes (approximate serving mode)")}
    for mode in ("exact", "fast"):
        t0 = time.time()
        def builder(snr_db, mode=mode):
            return make_polar_pipeline(
                N, K, frozen, snr_db, decoder="ca-scl", list_size=L,
                scl_chunk=128 if on_tpu else 64,
                scl_body_impl="xla",
                scl_control_impl="unroll-kernel" if on_tpu else "split",
                scl_node_mode=mode)

        out[mode] = run_snr_sweep(
            builder, K - 8, snrs, num_frames=args.frames,
            max_errors=args.max_errors, seed=42, chunk_frames=args.batch,
            chunks_per_dispatch=args.chunks_per_dispatch, verbose=True)
        out[mode]["elapsed_s"] = round(time.time() - t0, 1)
        print(f"{mode}: {out[mode]['elapsed_s']}s", flush=True)
    # per-point gap summary
    gaps = []
    for i, s in enumerate(snrs):
        fe, ff = out["exact"]["fer"][i], out["fast"]["fer"][i]
        gaps.append({"snr_db": s, "fer_exact": fe, "fer_fast": ff,
                     "fer_ratio_fast_over_exact":
                         (ff / fe) if fe > 0 else None})
    out["gap"] = gaps
    res = ROOT / "results" / "tpu" / "fast_nodes_curve.json"
    res.parent.mkdir(parents=True, exist_ok=True)
    res.write_text(json.dumps(out, indent=2))
    print(f"wrote {res}", flush=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5.5))
    for mode, style in (("exact", "o-"), ("fast", "s--")):
        fer = [f if f > 0 else np.nan for f in out[mode]["fer"]]
        ber = [b if b > 0 else np.nan for b in out[mode]["ber"]]
        ax.semilogy(snrs, fer, style, label=f"{mode} FER")
        ax.semilogy(snrs, ber, style, alpha=0.4, label=f"{mode} BER")
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel("error rate")
    ax.set_title(f"CA-SCL-{L} N={N}: exact vs SSCL fast list nodes")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig_path = ROOT / "results" / "figures" / "fast_nodes_curve.png"
    fig_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(fig_path, dpi=150)
    print(f"wrote {fig_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
