"""Per-chunk-variant timing of the SCL superkernel decoder.

The whole-decode breakdown (``scl_breakdown_probe.py``) splits cost only
by synthetic mask (all-frozen floor vs real vs all-info).  This probe
times EACH chunk-step superkernel of the real schedule in isolation —
scan-chaining one variant on its own output state — so the flagship's
per-chunk cost, and the glue-vs-body split per chunk (via an all-frozen
body twin at the same (descend, ascend, compose) signature), are measured
directly instead of inferred.

Method: one chunk-step fn has signature state → state (alpha/pend/beta/pm
tuples of static shapes), so ``lax.scan`` of a single variant over its own
carry gives a steady-state per-step cost with zero dispatch tax after the
first step.  Synthetic operands (random LLR-scale alphas, random 0/1
betas, random rank vectors) exercise the identical static program — cost
is data-independent.

Usage:
  python tools/scl_variant_probe.py                 # flagship, kernels
  python tools/scl_variant_probe.py --mode xla      # fused-XLA twins
  python tools/scl_variant_probe.py --no-twins      # skip frozen twins
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
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--perm", default="rank", choices=["onehot", "rank"])
    ap.add_argument("--leaf", default="onehot", choices=["onehot", "sort"])
    ap.add_argument("--mode", default="kernel", choices=["kernel", "xla"])
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-twins", action="store_true",
                    help="skip the all-frozen glue twins")
    ap.add_argument("--no-bodies", action="store_true",
                    help="skip the body-only kernels")
    ap.add_argument("--chunks", default="",
                    help="comma-separated chunk positions (default: all)")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        bit_reverse_permutation,
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar import scanscl as sc
    from polarcode_and_ldpc_tpu.sim.throughput import _force

    N, Lsz, S, B = args.N, args.L, args.chunk, args.batch
    dtype = jnp.float32
    frozen, _ = fec.construct_polar_code(N, N // 2, "bhattacharyya", 2.0)
    mask = frozen_mask_from_positions(N, frozen)
    rev = np.asarray(bit_reverse_permutation(N))
    chunk_flags = mask[rev].reshape(N // S, S)
    C = N // S
    t = int(np.log2(C))
    sizes = [N >> l for l in range(t + 1)]
    desc_k = np.array(
        [t if c == 0
         else (t + 1 + sc._ctz(c)
               if c == (1 << sc._ctz(c)) and sc._ctz(c) <= t - 2
               else sc._ctz(c))
         for c in range(C)], np.int32)
    asc_j = np.array([sc._ctz(c + 1) for c in range(C)], np.int32)
    comp_a, comp_b = sc.pend_liveness(desc_k, asc_j, t, C)
    comp_a = tuple(frozenset() if chunk_flags[c].all() else comp_a[c]
                   for c in range(C - 1))
    comp_b = tuple(frozenset() if chunk_flags[c].all() else comp_b[c]
                   for c in range(C - 1))

    rng = np.random.default_rng(0)

    def synth_state():
        llr = jnp.asarray(rng.standard_normal((N, B)).astype(np.float32) * 4)
        alpha = tuple(
            jnp.asarray(rng.standard_normal(
                (Lsz, sizes[l], B)).astype(np.float32) * 4)
            for l in range(1, t + 1))
        beta = tuple(
            jnp.asarray(rng.integers(0, 2, (Lsz, sizes[l], B)), jnp.int8)
            for l in range(1, t + 1))
        if args.perm == "rank":
            pend = lambda: jnp.asarray(  # noqa: E731
                rng.integers(0, Lsz, (Lsz, B)), jnp.int32)
        else:
            def pend():
                r = rng.integers(0, Lsz, (Lsz, B))
                return jnp.asarray(
                    (r[:, None, :] == np.arange(Lsz)[None, :, None]), dtype)
        pend_a = tuple(pend() for _ in range(t))
        pend_b = tuple(pend() for _ in range(t))
        pm = jnp.asarray(
            -np.abs(rng.standard_normal((Lsz, B))).astype(np.float32) * 10)
        return llr, alpha, pend_a, beta, pend_b, pm

    def build(c: int, flags):
        sel, j = int(desc_k[c]), int(asc_j[c])
        ca, cb = comp_a[c], comp_b[c]
        if args.mode == "kernel":
            from polarcode_and_ldpc_tpu.ops.scl_superchunk_pallas import (
                make_superchunk_pallas,
            )
            return make_superchunk_pallas(
                sel, flags, j, t, sizes, Lsz, dtype, leaf_impl=args.leaf,
                compose_a=ca, compose_b=cb, perm_impl=args.perm)
        alg = (sc.rank_algebra_for(Lsz) if args.perm == "rank" else None)
        body = sc._make_chunk_body(flags, Lsz, dtype, args.leaf, algebra=alg)
        return sc._make_super_fn(sel, j, t, sizes, Lsz, dtype, body,
                                 algebra=alg, compose_a=ca, compose_b=cb)

    def time_step(fn, label):
        llr, alpha, pend_a, beta, pend_b, pm = synth_state()

        def step(carry, _):
            a, pa, bb, pb, m = carry
            return fn(llr, a, pa, bb, pb, m), None

        @jax.jit
        def run(carry):
            out, _ = lax.scan(step, carry, None, length=args.reps)
            return out

        carry = (alpha, pend_a, beta, pend_b, pm)
        t0 = time.perf_counter()
        out = run(carry)
        _force(out[-1])
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(carry)
            _force(out[-1])
            best = min(best, (time.perf_counter() - t0) / args.reps)
        print(json.dumps({"what": label, "mode": args.mode,
                          "perm": args.perm, "leaf": args.leaf,
                          "batch": B, "chunk": S,
                          "per_step_us": round(best * 1e6, 1),
                          "compile_s": round(tc, 1)}), flush=True)
        return best

    sel_chunks = (list(range(C - 1)) if not args.chunks
                  else [int(x) for x in args.chunks.split(",")])
    total = 0.0
    for c in sel_chunks:
        flags = chunk_flags[c]
        nf = int(flags.sum())
        dt = time_step(build(c, flags),
                       f"chunk{c} sel={int(desc_k[c])} j={int(asc_j[c])} "
                       f"frozen={nf}/{S}")
        total += dt
        if not args.no_twins and nf < S:
            time_step(build(c, np.ones(S, bool)),
                      f"chunk{c}-frozen-twin sel={int(desc_k[c])} "
                      f"j={int(asc_j[c])}")
    print(json.dumps({"what": "sum-of-chunks (excl last)", "batch": B,
                      "total_ms": round(total * 1e3, 3)}), flush=True)

    if not args.no_bodies:
        if args.mode == "kernel":
            from polarcode_and_ldpc_tpu.ops.scl_body_pallas import (
                make_chunk_body_pallas,
            )
        seen = set()
        for c in sel_chunks + [C - 1]:
            key = chunk_flags[c].tobytes()
            if key in seen:
                continue
            seen.add(key)
            flags = chunk_flags[c]
            if args.mode == "kernel":
                body = make_chunk_body_pallas(flags, Lsz, dtype,
                                              leaf_impl=args.leaf,
                                              perm_impl=args.perm)
            else:
                alg = (sc.rank_algebra_for(Lsz) if args.perm == "rank"
                       else None)
                body = sc._make_chunk_body(flags, Lsz, dtype, args.leaf,
                                           algebra=alg)
            alpha0 = jnp.asarray(
                rng.standard_normal((Lsz, S, B)).astype(np.float32) * 4)
            pm0 = jnp.asarray(
                -np.abs(rng.standard_normal((Lsz, B))).astype(np.float32))

            def bstep(carry, _, body=body):
                a, m = carry
                bb, m2, _ = body(a, m)
                # feed beta back through a cast so shapes/dtypes close
                return (a + bb.astype(dtype) * 0, m2), None

            @jax.jit
            def brun(carry, bstep=bstep):
                out, _ = lax.scan(bstep, carry, None, length=args.reps)
                return out

            t0 = time.perf_counter()
            out = brun((alpha0, pm0))
            _force(out[-1])
            tc = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = brun((alpha0, pm0))
                _force(out[-1])
                best = min(best, (time.perf_counter() - t0) / args.reps)
            print(json.dumps({
                "what": f"body-only frozen={int(flags.sum())}/{S} "
                        f"(first at chunk {c})",
                "mode": args.mode, "per_step_us": round(best * 1e6, 1),
                "compile_s": round(tc, 1)}), flush=True)


if __name__ == "__main__":
    main()
