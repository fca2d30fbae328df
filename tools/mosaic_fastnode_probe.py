#!/usr/bin/env python
"""Mosaic feasibility probe for the kernel fast-node forms (round 3):

The SSCL fast list nodes need, inside a Pallas TPU kernel:
  1. 3-D middle-axis reductions with keepdims ([L, S, B] → [L, 1, B])
  2. [L, 1, B] broadcasts against [L, S, B] (compare/select/add)
  3. ``lax.slice_in_dim`` halving tree-sums along the middle axis
  4. iterative masked min-extraction with int32 position iota

Known Mosaic hazard class: replicated LEADING-dim broadcasts on 3-D
vectors (scl_body_pallas.py docstring).  Middle-singleton broadcasts are
a different lowering path — this probe proves them (or finds the error
string to design around) in isolation before the fast nodes are built on
them.

Usage: python tools/mosaic_fastnode_probe.py [--interpret]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    L, S, B = 8, 64, 128
    K = L - 1

    def tree_sum(x, axis=1):
        n = x.shape[axis]
        while n > 1:
            h = n // 2
            x = (lax.slice_in_dim(x, 0, h, axis=axis)
                 + lax.slice_in_dim(x, h, n, axis=axis))
            n = h
        return x  # keepdims form [L, 1, B]

    def kernel(a_ref, out_mag_ref, out_idx_ref, out_sum_ref):
        a = a_ref[:]
        mags = jnp.abs(a)
        pos = lax.broadcasted_iota(jnp.int32, mags.shape, 1)
        # (3) tree-sum of softplus along the middle axis
        sp = jnp.logaddexp(jnp.zeros_like(mags), -mags)
        out_sum_ref[:] = tree_sum(sp)
        # (1)+(2)+(4): K rounds of masked stable min-extraction
        taken = jnp.zeros(mags.shape, jnp.bool_)
        inf = jnp.asarray(jnp.inf, mags.dtype)
        mag_rows, idx_rows = [], []
        for _ in range(K):
            avail = jnp.where(taken, inf, mags)
            m = jnp.min(avail, axis=1, keepdims=True)       # [L, 1, B]
            eq = (avail == m) & ~taken                      # middle bcast
            first = jnp.min(jnp.where(eq, pos, S), axis=1,
                            keepdims=True)                  # [L, 1, B]
            sel = pos == first                              # middle bcast
            taken = taken | sel
            mag_rows.append(m)
            idx_rows.append(first)
        out_mag_ref[:] = jnp.concatenate(mag_rows, axis=1)  # [L, K, B]
        out_idx_ref[:] = jnp.concatenate(idx_rows, axis=1)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((L, S, B)).astype(np.float32) * 2)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        out_shape=(
            jax.ShapeDtypeStruct((L, K, B), jnp.float32),
            jax.ShapeDtypeStruct((L, K, B), jnp.int32),
            jax.ShapeDtypeStruct((L, 1, B), jnp.float32),
        ),
        interpret=args.interpret,
    )(a)
    magK, idxK, ssum = (np.asarray(x) for x in out)

    # ground truth via stable sort
    mags = np.abs(np.asarray(a))
    order = np.argsort(mags, axis=1, kind="stable")
    exp_idx = order[:, :K, :]
    exp_mag = np.take_along_axis(mags, exp_idx, axis=1)
    ok_idx = (idxK == exp_idx).all()
    ok_mag = (magK == exp_mag).all()
    # transcendentals must compare against the SAME device's XLA lowering
    # (TPU exp/log1p differ from host libm by ~1e-3 abs — measured; the
    # kernel is bit-exact vs on-device XLA, which is the contract)
    exp_sum = np.asarray(jax.jit(
        lambda x: tree_sum(jnp.logaddexp(jnp.zeros_like(x), -jnp.abs(x))))(a))
    ok_sum = (ssum == exp_sum).all()
    print(f"idx match: {ok_idx}  mag match: {ok_mag}  "
          f"treesum bit-exact vs on-device XLA: {ok_sum}")
    return 0 if (ok_idx and ok_mag and ok_sum) else 1


if __name__ == "__main__":
    raise SystemExit(main())
