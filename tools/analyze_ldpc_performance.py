#!/usr/bin/env python
"""LDPC iteration-count statistics vs SNR (reference
``debug_scripts/analyze_ldpc_performance.py``: n=504 k=252 study).

Usage: python tools/analyze_ldpc_performance.py [--n 504] [--frames 512]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=504)
    ap.add_argument("--k", type=int, default=252)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    import numpy as np

    import polarcode_and_ldpc_tpu as fec

    enc = fec.LDPCEncoder(args.n, args.k, dv=3, dc=6, seed=42)
    dec = fec.BPDecoder(enc.H, max_iter=args.max_iter)
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, (args.frames, enc.k))
    cw = enc.encode(msgs)
    print(f"n={args.n} k={enc.k} max_iter={args.max_iter}, {args.frames} frames")
    print(f"{'SNR':>6} {'BER':>10} {'FER':>8} {'mean it':>8} {'p50':>5} "
          f"{'p95':>5} {'max':>5} {'conv%':>6}")
    for snr in (0.0, 1.0, 2.0, 3.0, 4.0):
        chan = fec.AWGNChannel(snr_db=snr, seed=int(snr * 10) + 1)
        bits, iters = dec.decode(chan.transmit(cw), return_iterations=True)
        it = np.asarray(iters)
        dm = np.asarray(bits)[:, enc.info_positions]
        ber = (dm != msgs).mean()
        fer = np.any(dm != msgs, axis=1).mean()
        conv = (it < args.max_iter).mean() * 100
        print(f"{snr:6.1f} {ber:10.3e} {fer:8.4f} {it.mean():8.2f} "
              f"{int(np.percentile(it, 50)):5d} {int(np.percentile(it, 95)):5d} "
              f"{int(it.max()):5d} {conv:6.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
