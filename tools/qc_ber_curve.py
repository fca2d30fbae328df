"""BER/FER curve for the n=8192 QC-LDPC code on TPU →
results/tpu/ldpc_n8192_qc_curve.json.

Completes the large-code demonstration (BASELINE configs[4]): not just
decode throughput but a full error-rate curve through the end-to-end
Monte-Carlo pipeline (runtime-SNR: one compile for the whole curve).

Usage: python tools/qc_ber_curve.py [--frames 100000] [--cpu]
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

OUT = Path(__file__).resolve().parent.parent / "results" / "tpu"


def _log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--snrs", default="0.0,0.5,0.75,1.0,1.25,1.5,2.0,3.0")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_ldpc_pipeline

    n, k, z = 8192, 4096, 512
    _log("constructing QC base + systematic G (host) ...")
    base = fec.qc_base_matrix(n, k, z, dv=3, dc=6, seed=42)
    enc = fec.LDPCEncoder(n, k, H=fec.qc_expand(base, z))
    step = make_ldpc_pipeline(enc.H, enc.G, None, decoder="bp", max_iter=20,
                              message_idx=enc.info_positions,
                              qc_base=base, z=z)
    sim = MonteCarloSimulator(step, enc.k, chunk_frames=args.batch)
    curve = {"snr_db": [], "ber": [], "fer": [], "frames_tested": [],
             "avg_iterations": [], "throughput_mbps": []}
    t0 = time.perf_counter()
    for snr in (float(x) for x in args.snrs.split(",")):
        res = sim.run(args.frames, max_errors=500, seed=9,
                      extra_args=(jnp.float32(snr),))
        curve["snr_db"].append(snr)
        curve["ber"].append(res.ber)
        curve["fer"].append(res.fer)
        curve["frames_tested"].append(res.frames)
        curve["avg_iterations"].append(res.avg_iterations)
        curve["throughput_mbps"].append(res.throughput_mbps)
        _log(f"SNR {snr:+.2f}: BER {res.ber:.3e} FER {res.fer:.3e} "
             f"frames {res.frames} iters {res.avg_iterations:.2f} "
             f"{res.throughput_mbps:.1f} Mbps")
    out = {
        "config": {"n": n, "k": k, "z": z, "dv": 3, "dc": 6,
                   "decoder": "qc-bp", "max_iter": 20,
                   "frames_per_point": args.frames, "max_errors": 500,
                   "batch": args.batch},
        "curve": curve,
        "total_wall_seconds": time.perf_counter() - t0,
        "device": str(jax.devices()[0]),
    }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "ldpc_n8192_qc_curve.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out["curve"]))


if __name__ == "__main__":
    main()
