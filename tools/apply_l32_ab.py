"""A/B the rank-apply formulations at large list sizes (XLA path).

At L = 32 the select-sum rank apply is O(L·J) element-ops per plane
element and dominates the N=4096 SCL-32 decode (q4 breakdown: real-mask
time is ~3x the all-frozen floor).  The gather form was measured 186x
SLOWER (XLA scalarizes per-lane-index gathers, CLAUDE.md).  This probes a
third form: one-hot MATMUL — ``out[l,m,b] = sum_j P[l,j,b] x[j,m,b]`` as a
batched ``dot_general`` riding the MXU.

Exactness argument (also verified bitwise here): P is one-hot with exact
0/1 entries and the payloads are finite (alpha planes / beta bits — path
metrics with -inf phantoms never go through apply_perm), so every product
is an exact 0 or an exact bf16x3 split of one f32, and the accumulated
sum reconstructs that single f32 exactly in any association order.

Usage: python tools/apply_l32_ab.py [--L 32] [--M 512] [--B 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=32)
    ap.add_argument("--M", type=int, default=512)
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from polarcode_and_ldpc_tpu.models.polar.scanscl import _apply_perm_rank
    from polarcode_and_ldpc_tpu.sim.throughput import _force

    L, M, B = args.L, args.M, args.B
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.integers(0, L, (L, B)), jnp.int32)
    x = jnp.asarray(rng.standard_normal((L, M, B)).astype(np.float32) * 40)
    xb = jnp.asarray(rng.integers(0, 2, (L, M, B)), jnp.int8)

    def apply_matmul(r, x):
        J = x.shape[0]
        P = (r[:, None, :] == lax.broadcasted_iota(
            jnp.int32, (r.shape[0], J, r.shape[1]), 1)).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        out = jnp.einsum("ljb,jmb->lmb", P, xf,
                         precision=lax.Precision.HIGHEST)
        return out.astype(x.dtype)

    def timed(fn, opd, label):
        @jax.jit
        def run(o):
            def step(carry, _):
                return fn(r, carry), None
            out, _ = lax.scan(step, o, None, length=args.reps)
            return out

        t0 = time.perf_counter()
        out = run(opd)
        _force(out)
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(opd)
            _force(out)
            best = min(best, (time.perf_counter() - t0) / args.reps)
        print(json.dumps({"what": label, "L": L, "M": M, "B": B,
                          "per_apply_us": round(best * 1e6, 1),
                          "compile_s": round(tc, 1)}), flush=True)

    # bitwise equality first (single application, f32 and int8 payloads)
    a_sel = _apply_perm_rank(r, x)
    a_mm = apply_matmul(r, x)
    b_sel = _apply_perm_rank(r, xb)
    b_mm = apply_matmul(r, xb)
    print(json.dumps({
        "what": "bitwise-match",
        "f32": bool(jnp.all(a_sel == a_mm)),
        "int8": bool(jnp.all(b_sel == b_mm))}), flush=True)

    timed(_apply_perm_rank, x, "select-sum f32")
    timed(apply_matmul, x, "matmul f32")
    timed(_apply_perm_rank, xb, "select-sum int8")
    timed(apply_matmul, xb, "matmul int8")


if __name__ == "__main__":
    main()
