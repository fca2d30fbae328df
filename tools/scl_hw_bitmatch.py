"""Hardware bit-exactness check: the full unroll-kernel superkernel path
(rank algebra, packed-bitfield compose/bit-applies, roll-partner levelpar,
fused last-chunk butterfly) vs the one-hot split control — two maximally
disjoint code paths that must produce identical bits and metrics.

Usage: python tools/scl_hw_bitmatch.py [--batch 512] [--chunk 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--K", type=int, default=512)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--matmul-min-l", type=int, default=0,
                    help="also check the MXU one-hot-matmul rank apply "
                         "(FEC_RANK_MATMUL_MIN_L=<v> while building a "
                         "third, unroll-fused/xla decoder) — the hardware "
                         "gate for the bf16-split einsum exactness claim "
                         "(ADVICE r4 #1)")
    ap.add_argument("--no-kernel", action="store_true",
                    help="skip the unroll-kernel config (its ~25 min "
                         "compile) — e.g. when gating only the matmul "
                         "apply against the one-hot reference")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from polarcode_and_ldpc_tpu.models.polar.construction import (
        construct_polar_code,
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )

    rng = np.random.default_rng(0)
    frozen, _ = construct_polar_code(args.N, args.K)
    mask = frozen_mask_from_positions(args.N, frozen)
    llr_np = rng.standard_normal((args.batch, args.N)).astype(np.float32) * 2
    llr_np[0, :5] = 0.0  # tie stress
    llr = jnp.asarray(llr_np)

    configs = [
        ("unroll-kernel/rank", dict(control_impl="unroll-kernel",
                                    perm_impl="rank", body_impl="pallas"), {}),
        ("split/onehot", dict(control_impl="split", perm_impl="onehot",
                              body_impl="xla"), {}),
    ]
    if args.no_kernel:
        configs = configs[1:]
    if args.matmul_min_l:
        configs.append(
            ("unroll-fused/rank-matmul",
             dict(control_impl="unroll-fused", perm_impl="rank",
                  body_impl="xla"),
             {"FEC_RANK_MATMUL_MIN_L": str(args.matmul_min_l)}))
    outs = {}
    for name, kw, env in configs:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            dec = jax.jit(make_scl_decoder_scan(args.N, mask, args.L,
                                                chunk=args.chunk, **kw))
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        t0 = time.time()
        u, m = dec(llr)
        u, m = np.asarray(u), np.asarray(m)
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
        outs[name] = (u, m)
    ref = outs["split/onehot"]
    ok = True
    for name, (u, m) in outs.items():
        if name == "split/onehot":
            continue
        bits_ok = bool((u == ref[0]).all())
        pm_ok = bool((m == ref[1]).all())
        ok = ok and bits_ok and pm_ok
        print(f"hardware bit-match [{name}]: bits={bits_ok} "
              f"metrics={pm_ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
