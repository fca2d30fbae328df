#!/usr/bin/env python
"""A/B the chunk-scan SCL control schedules on hardware with
throughput-true timing (chained dispatches, one forced fetch — see
tools/scl_pallas_ab.py for why) AND full-output bit-equality against the
split-control baseline.

Usage: python tools/scl_control_ab.py [--controls split unroll-kernel ...]
       [--batch 8192] [--chunk 128] [--body xla]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--controls", nargs="+",
                    default=["split", "unroll-fused", "unroll-kernel"])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--K", type=int, default=512)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--body", default="xla")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"device: {jax.devices()[0]}", flush=True)

    from polarcode_and_ldpc_tpu.models.polar.construction import (
        construct_polar_code, frozen_mask_from_positions)
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan

    rng = np.random.default_rng(0)
    N, K, L, Bsz = args.N, args.K, args.L, args.batch
    frozen, _ = construct_polar_code(N, K)
    mask = frozen_mask_from_positions(N, frozen)
    llr = jnp.asarray(rng.standard_normal((Bsz, N)).astype(np.float32) * 2.0)

    outs = {}
    rc = 0
    for ctrl in args.controls:
        dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=args.chunk,
                                            body_impl=args.body,
                                            control_impl=ctrl))
        t0 = time.time()
        u, m = dec(llr)
        np.asarray(m)[0, 0]
        print(f"{ctrl}: compile+first {time.time()-t0:.1f}s", flush=True)
        outs[ctrl] = (np.asarray(u), np.asarray(m))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                u, m = dec(llr)
            np.asarray(m)[0, 0]
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{ctrl}: steady {best*1e3:.1f} ms → {Bsz*K/best/1e6:.1f} Mbps",
              flush=True)
        ref = args.controls[0]
        if ctrl != ref:
            ok = ((outs[ref][0] == outs[ctrl][0]).all()
                  and np.array_equal(outs[ref][1], outs[ctrl][1]))
            print(f"{ctrl} vs {ref} bit-exact: {ok}", flush=True)
            rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
