"""Decompose scan-chunked SCL cost: run the same decoder on synthetic
frozen masks to isolate components.

  all-frozen  → trivial chunk bodies: measures scan glue + carry traffic
  all-info    → maximal leaf-selection work
  real        → flagship bhattacharyya mask

Usage: python tools/scl_breakdown_probe.py [--batch 8192] [--chunk 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--body", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--control", default="split",
                    choices=["split", "fused", "unroll-fused",
                             "unroll-kernel", "kernel"])
    ap.add_argument("--perm", default="rank", choices=["onehot", "rank"])
    ap.add_argument("--leaf", default="onehot", choices=["onehot", "sort"])
    ap.add_argument("--mask-dedup", default="exact", choices=["exact", "union"])
    ap.add_argument("--batch-tile", type=int, default=128)
    ap.add_argument("--masks", default="all_frozen,all_info,real_rate_half")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan
    from polarcode_and_ldpc_tpu.sim.throughput import _force

    N, L, B = args.N, args.L, args.batch
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32) * 4)

    frozen, _ = fec.construct_polar_code(N, N // 2, "bhattacharyya", 2.0)
    real = frozen_mask_from_positions(N, frozen)
    masks = {
        "all_frozen": np.ones(N, bool),
        "all_info": np.zeros(N, bool),
        "real_rate_half": real,
    }
    for name in args.masks.split(","):
        mask = masks[name]
        dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=args.chunk,
                                            body_impl=args.body,
                                            control_impl=args.control,
                                            perm_impl=args.perm,
                                            leaf_impl=args.leaf,
                                            mask_dedup=args.mask_dedup,
                                            batch_tile=args.batch_tile))
        t0 = time.perf_counter()
        _force(dec(llr))
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(5):
                o = dec(llr)
            _force(o)
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f'{{"mask": "{name}", "batch": {B}, "chunk": {args.chunk}, '
              f'"body": "{args.body}", "control": "{args.control}", '
              f'"perm": "{args.perm}", "leaf": "{args.leaf}", '
              f'"compile_s": {tc:.1f}, "steady_s": {best:.4f}}}', flush=True)


if __name__ == "__main__":
    main()
