"""Static op census of the SCL chunk-step kernels.

Traces each flagship chunk-step program (the SAME jnp program Mosaic
compiles — ``_make_super_fn`` with the in-kernel loop algebra) and
histograms the jaxpr equations by primitive, weighting each op by its
output's vreg-row count (``prod(shape[:-1])``, i.e. sublane rows at a
128-lane batch tile).  This is the op-issue cost model for a VPU that
retires ~1 (8,128) vreg-op per cycle: rows/8 = vreg count, padded rows
(< 8 per slab) round UP — exactly the deep-level waste we suspect.

Output: per chunk, total padded vs dense vreg counts and the top
primitives; plus a leaf-vs-glue split (ops inside the chunk body vs the
descend/compose/ascend wrapper, separated by tracing the body alone).

Pure CPU static analysis - no TPU needed.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def census(fn, args_shapes, title):
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args_shapes)
    prim_rows: Counter = Counter()
    prim_vregs: Counter = Counter()
    prim_vregs_dense: Counter = Counter()
    total_eqns = 0

    def walk(jx):
        nonlocal total_eqns
        for eq in jx.eqns:
            for sub in (v for v in eq.params.values()
                        if hasattr(v, "jaxpr")):
                walk(sub.jaxpr)
            if eq.primitive.name in ("pjit", "closed_call", "scan", "cond"):
                continue
            total_eqns += 1
            for out in eq.outvars:
                shape = getattr(out.aval, "shape", ())
                if not shape:
                    continue
                rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
                lanes = shape[-1]
                lane_tiles = max(1, -(-lanes // 128))
                itemsize = np.dtype(out.aval.dtype).itemsize
                sub_rows = 8 if itemsize >= 4 else (32 if itemsize == 1
                                                    else 16)
                # padded: each leading-dim slab rounds its minor-2 dim up
                if len(shape) >= 2:
                    slab = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
                    minor2 = shape[-2]
                    vregs = slab * -(-minor2 // sub_rows) * lane_tiles
                    dense = max(1, (slab * minor2 * lane_tiles
                                    + sub_rows - 1) // sub_rows)
                else:
                    vregs = lane_tiles
                    dense = lane_tiles
                name = eq.primitive.name
                prim_rows[name] += rows
                prim_vregs[name] += vregs
                prim_vregs_dense[name] += dense

    walk(jaxpr.jaxpr)
    tot_v = sum(prim_vregs.values())
    tot_d = sum(prim_vregs_dense.values())
    print(f"\n== {title}: eqns {total_eqns}, padded vregs {tot_v}, "
          f"dense vregs {tot_d} (waste {tot_v / max(tot_d, 1):.2f}x)")
    for name, v in prim_vregs.most_common(12):
        print(f"   {name:22s} vregs {v:7d} (dense {prim_vregs_dense[name]:7d})")
    return tot_v, tot_d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--leaf", default="onehot", choices=["onehot", "sort"])
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        bit_reverse_permutation,
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar import scanscl as sc
    from polarcode_and_ldpc_tpu.ops.scl_body_pallas import (
        _RANK_LOOP_ALGEBRA,
    )
    from polarcode_and_ldpc_tpu.ops.scl_superchunk_pallas import (
        _SUPER_RANK_ALGEBRA,
    )

    N, Lsz, S, B = args.N, args.L, args.chunk, args.tile
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

    f32 = jnp.zeros
    gtot_v = gtot_d = 0
    for c in range(C - 1):
        body = sc._make_chunk_body(chunk_flags[c], Lsz, dtype, args.leaf,
                                   algebra=_RANK_LOOP_ALGEBRA)
        fn = sc._make_super_fn(int(desc_k[c]), int(asc_j[c]), t, sizes, Lsz,
                               dtype, body, algebra=_SUPER_RANK_ALGEBRA,
                               compose_a=comp_a[c], compose_b=comp_b[c])
        llr = f32((N, B), dtype)
        alpha = tuple(f32((Lsz, sizes[l], B), dtype) for l in range(1, t + 1))
        beta = tuple(f32((Lsz, sizes[l], B), jnp.int8)
                     for l in range(1, t + 1))
        pend = tuple(f32((Lsz, B), jnp.int32) for _ in range(t))
        pm = f32((Lsz, B), dtype)
        v, d = census(lambda *a: fn(*a),
                      (llr, alpha, pend, beta, pend, pm),
                      f"chunk{c} sel={int(desc_k[c])} j={int(asc_j[c])} "
                      f"frozen={int(chunk_flags[c].sum())}/{S}")
        gtot_v += v
        gtot_d += d

        # body alone (to split leaf/body vs glue)
        bv, bd = census(lambda a, m: body(a, m),
                        (f32((Lsz, S, B), dtype), pm),
                        f"chunk{c} BODY only")
    print(f"\nTOTAL chunks 0..{C - 2}: padded {gtot_v} vregs, dense {gtot_d} "
          f"(waste {gtot_v / max(gtot_d, 1):.2f}x) — at ~1 vreg-op/cycle/"
          f"940MHz ≈ {gtot_v / 0.94e3:.1f} us/tile")


if __name__ == "__main__":
    main()
