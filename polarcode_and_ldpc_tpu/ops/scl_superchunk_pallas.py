"""Whole-chunk-step SCL superkernels (the round-2 "glue is the bottleneck"
fix).

With the chunk *bodies* already fused (``scl_body_pallas.py``), the
breakdown probe shows ~75-80% of flagship decode time left in the per-chunk
glue — descend refreshes, pending composes, ascend combines — which XLA
runs as hundreds of small kernels per chunk (launch overhead, not FLOPs:
the glue's arithmetic is ~2 ms of a 21.6 ms all-frozen floor at batch
8192).  This module fuses ONE ENTIRE chunk step — descend(sel) → subtree
body → pending composes → ascend(j) — into a single TPU kernel per
(descend, pattern, ascend) variant.

The kernel body is the same jnp program as the XLA fused-control path:
``scanscl._make_super_fn`` traced against VMEM refs with the static-loop
one-hot algebra (``scl_body_pallas._LOOP_ALGEBRA``), so outputs are
bit-identical by construction (tests enforce, interpret mode on CPU).

Selective operands: each variant touches only a static subset of the
level stacks (``scanscl.super_touch_sets``) — untouched levels never
enter the kernel, keeping per-variant VMEM ≤ ~5 MB per 128-lane batch
tile (v5e VMEM ≈ 16 MB).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.polar.scanscl import (
    _make_chunk_body,
    _make_last_fn,
    _make_super_fn,
    rank_algebra_for,
    super_touch_sets,
)
from .scl_body_pallas import _LOOP_ALGEBRA, _RANK_LOOP_ALGEBRA

#: operand-sum budget for one superkernel invocation (v5e VMEM ≈ 16 MB per
#: core; leave ~half for in-kernel temporaries — broadcast parents, one-hot
#: products).  Variants whose declared I/O exceeds this fall back to the
#: bit-identical fused-XLA branch (hybrid control), which makes the kernel
#: control modes safe at any (N, L): large codes keep kernels for the
#: frequent deep-level chunk steps and run the rare tall ascends in XLA.
VMEM_OPERAND_BUDGET = 8 * 1024 * 1024


def _pend_bytes(Lsz: int, batch_tile: int, dtype, perm_impl: str) -> int:
    """Bytes of ONE pending-permutation operand: one-hot ``[L, L, B]``
    dtype vs rank-vector ``[L, B]`` int32 (L× smaller — the change that
    lets L = 32 variants fit the budget)."""
    if perm_impl == "rank":
        return Lsz * batch_tile * 4
    return Lsz * Lsz * batch_tile * jnp.dtype(dtype).itemsize


def _slim_alpha_plans(sel: int, j: int, t: int, touch, Lsz: int,
                      slim_writes: bool):
    """State-DMA elision plan for one variant's alpha I/O (round 4):

    * the level-t alpha (index t−1) is written by EVERY descend but only
      ever consumed by the chunk body INSIDE the same kernel — no later
      schedule event reads it (``alpha_read`` is ``lo−2 ≤ t−2``), so its
      state write is dead across kernels and is elided;
    * invariant-parent variants read only ``alpha[lo−2][:1]`` (the level
      is still chunk-0's path-invariant broadcast) — the kernel takes a
      1-slab operand instead of the full L-plane;
    * chunk 0 (sel = t) writes path-invariant planes: with
      ``slim_writes`` the kernel emits ``[1, M, B]`` and the JAX wrapper
      re-broadcasts lazily (valid for the straight-line unroll controls,
      where every reader of a chunk-0-written value is an invariant
      ``[:1]`` read — the broadcast never materializes).

    Returns ``(read_plan, write_plan)`` as lists of (kind, level) with
    kind ∈ {"alpha", "alpha_slim"}.
    """
    from ..models.polar.scanscl import decode_selector

    k, inv = decode_selector(sel, t)
    # the level-t elision below is unconditional (all kernel controls):
    # check the schedule invariant it relies on structurally — no variant
    # may read alpha[t-1] across kernels (descend reads are lo-2 <= t-2)
    assert (t - 1) not in touch["alpha_read"], (
        f"variant (sel={sel}, j={j}, t={t}) reads the level-t alpha "
        f"across kernels — the unconditional state-write elision would "
        f"feed it stale state")
    reads = [("alpha_slim" if inv else "alpha", i)
             for i in touch["alpha_read"]]
    slim_w = slim_writes and k == t
    writes = [("alpha_slim" if slim_w else "alpha", i)
              for i in touch["alpha_write"] if i != t - 1]
    return reads, writes


def super_vmem_bytes(sel: int, j: int, t: int, sizes, Lsz: int, dtype,
                     batch_tile: int = 128, compose_a=None,
                     compose_b=None, perm_impl: str = "onehot",
                     slim_writes: bool = False) -> int:
    """Declared operand bytes (inputs + outputs) of one chunk-step
    superkernel variant at the given batch tile.  With live-compose masks
    (``scanscl.pend_liveness``) only the composed/read pendings ride
    through the kernel — the dominant VMEM term at large L in one-hot
    mode; rank mode shrinks each pending by L×."""
    touch = super_touch_sets(sel, j, t, compose_a, compose_b)
    fsz = jnp.dtype(dtype).itemsize
    total = sizes[0] * batch_tile * fsz if touch["needs_llr"] else 0
    a_reads, a_writes = _slim_alpha_plans(sel, j, t, touch, Lsz,
                                          slim_writes)
    for kind, i in a_reads + a_writes:
        rows = 1 if kind == "alpha_slim" else Lsz
        total += rows * sizes[i + 1] * batch_tile * fsz
    for i in touch["beta_read"] + touch["beta_write"]:
        total += Lsz * sizes[i + 1] * batch_tile  # int8
    n_pend = (len(touch["pend_a_in"]) + len(touch["pend_a_out"])
              + len(touch["pend_b_in"]) + len(touch["pend_b_out"]))
    total += n_pend * _pend_bytes(Lsz, batch_tile, dtype, perm_impl)
    total += 2 * Lsz * batch_tile * fsz  # pm in+out
    return total


def last_vmem_bytes(t: int, sizes, Lsz: int, dtype,
                    batch_tile: int = 128,
                    perm_impl: str = "onehot") -> int:
    """Declared operand bytes of the fused last-chunk kernel."""
    fsz = jnp.dtype(dtype).itemsize
    N = sizes[0]
    pend = _pend_bytes(Lsz, batch_tile, dtype, perm_impl)
    total = N * batch_tile * fsz if t == 1 else (
        Lsz * sizes[t - 1] * batch_tile * fsz  # alpha[t-2]
        + pend)                                # pend_a[t-2]
    for i in range(t):
        total += Lsz * sizes[i + 1] * batch_tile          # beta int8
        total += pend                                     # pend_b
    total += Lsz * N * batch_tile                         # root int8 out
    total += 2 * Lsz * batch_tile * fsz                   # pm in+out
    return total


def _broadcast_rows_concat(x, L):
    """Explicit row replication — Mosaic rejects leading-dim replicated
    broadcasts on 3D vectors (same bug class as the one-hot algebra)."""
    if x.shape[0] == L:
        return x
    assert x.shape[0] == 1, x.shape
    return jnp.concatenate([x] * L, axis=0)


#: in-kernel algebra: static-loop one-hot forms + explicit row replication
_SUPER_ALGEBRA = dict(_LOOP_ALGEBRA, broadcast_rows=_broadcast_rows_concat)
#: rank-vector variant (see ``scl_body_pallas._RANK_LOOP_ALGEBRA``)
_SUPER_RANK_ALGEBRA = dict(_RANK_LOOP_ALGEBRA,
                           broadcast_rows=_broadcast_rows_concat)


def _pend_identity(Lsz: int, B: int, dtype, perm_impl: str):
    """JAX-level identity permutation for reset-only pendings."""
    if perm_impl == "rank":
        return jnp.broadcast_to(jnp.arange(Lsz, dtype=jnp.int32)[:, None],
                                (Lsz, B))
    return jnp.broadcast_to(jnp.eye(Lsz, dtype=dtype)[..., None],
                            (Lsz, Lsz, B))


def make_superchunk_pallas(sel: int, flags: np.ndarray, j: int, t: int,
                           sizes, Lsz: int, dtype,
                           leaf_impl: str = "onehot",
                           batch_tile: int = 128, interpret: bool = False,
                           compose_a=None, compose_b=None,
                           perm_impl: str = "onehot",
                           node_mode: str = "exact",
                           slim_writes: bool = False,
                           widths=None):
    """Build one fused chunk-step kernel for the (sel, pattern, j) variant.

    Returns ``fn(llr_nb [N, B], alpha tuple, pend_a tuple, beta tuple,
    pend_b tuple, pm [L, B]) → (alpha', pend_a', beta', pend_b', pm')`` —
    the same contract as ``scanscl._make_super_fn`` (untouched levels pass
    through at the JAX level without entering the kernel; reset-only
    pendings are written as a JAX-level broadcast identity; composes run
    only for the live-mask levels — see ``scanscl.pend_liveness``).

    ``perm_impl`` selects the permutation representation the kernel (and
    its XLA fallback twin) trades in: one-hot ``[L, L, B]`` or int32 rank
    vectors ``[L, B]`` — must match the caller's pending state.

    ``widths`` (live-width decoding; rank mode only): dict with the
    variant's static state widths — ``wa``/``wb``/``wpa``/``wpb`` (per-
    level input widths, as in ``scanscl``'s width simulation) and
    ``lv_in``/``lv_out`` — the kernel traces the identical width-generic
    program with narrow operand shapes.  ``None`` = full width.
    """
    flags = np.asarray(flags, bool)
    assert perm_impl in ("onehot", "rank"), perm_impl
    rank = perm_impl == "rank"
    assert node_mode == "exact" or rank, \
        "in-kernel node_mode='fast' requires perm_impl='rank'"
    assert widths is None or rank, "live-width kernels are rank-only"
    lv_in = Lsz if widths is None else widths["lv_in"]
    lv_out = Lsz if widths is None else widths["lv_out"]
    touch = super_touch_sets(sel, j, t, compose_a, compose_b)
    a_reads, a_writes = _slim_alpha_plans(sel, j, t, touch, Lsz,
                                          slim_writes)
    b_read, b_write = touch["beta_read"], touch["beta_write"]
    needs_llr = touch["needs_llr"]
    N = sizes[0]

    body_kernel = _make_chunk_body(
        flags, Lsz, dtype, leaf_impl,
        algebra=_RANK_LOOP_ALGEBRA if rank else _LOOP_ALGEBRA,
        node_mode=node_mode)
    super_kernel_fn = _make_super_fn(
        sel, j, t, sizes, Lsz, dtype, body_kernel,
        algebra=_SUPER_RANK_ALGEBRA if rank else _SUPER_ALGEBRA,
        compose_a=compose_a, compose_b=compose_b,
        lv_in=lv_in, lv_out=lv_out)
    # bit-identical XLA twin — used for unaligned batches (tiny MC chunks)
    xla_algebra = rank_algebra_for(Lsz) if rank else None
    body_xla = _make_chunk_body(flags, Lsz, dtype, leaf_impl,
                                algebra=xla_algebra, node_mode=node_mode)
    super_xla_fn = _make_super_fn(sel, j, t, sizes, Lsz, dtype, body_xla,
                                  algebra=xla_algebra,
                                  compose_a=compose_a, compose_b=compose_b,
                                  lv_in=lv_in, lv_out=lv_out)

    # static operand schedule: (kind, level-index) in kernel-ref order
    in_plan = ([("llr", None)] if needs_llr else []) \
        + a_reads \
        + [("pend_a", i) for i in touch["pend_a_in"]] \
        + [("beta", i) for i in b_read] \
        + [("pend_b", i) for i in touch["pend_b_in"]] \
        + [("pm", None)]
    out_plan = a_writes \
        + [("pend_a", i) for i in touch["pend_a_out"]] \
        + [("beta", i) for i in b_write] \
        + [("pend_b", i) for i in touch["pend_b_out"]] \
        + [("pm", None)]
    eye_a, eye_b = touch["pend_a_eye"], touch["pend_b_eye"]

    def _w(kind, i, out):
        """Static operand width (live-width narrows it; Lsz otherwise)."""
        if kind == "alpha_slim":
            return 1
        if widths is None:
            return Lsz
        if out:
            return lv_in if kind == "alpha" else lv_out
        return {"alpha": widths["wa"], "beta": widths["wb"],
                "pend_a": widths["wpa"], "pend_b": widths["wpb"],
                "pm": None}[kind][i] if kind != "pm" else lv_in

    def _shape_dtype(kind, i, B, out=False):
        if kind == "llr":
            return (N, B), dtype
        w = _w(kind, i, out)
        if kind == "alpha":
            return (w, sizes[i + 1], B), dtype
        if kind == "alpha_slim":  # invariant planes: one path slab
            return (1, sizes[i + 1], B), dtype
        if kind == "beta":
            return (w, sizes[i + 1], B), jnp.int8
        if kind == "pm":
            return (w, B), dtype
        if rank:  # pend_a / pend_b as int32 rank vectors
            return (w, B), jnp.int32
        return (Lsz, Lsz, B), dtype  # pend_a / pend_b one-hot

    def _block_spec(kind, i, out=False):
        shape, _ = _shape_dtype(kind, i, batch_tile, out)
        nlead = len(shape) - 1
        return pl.BlockSpec(
            shape,
            (lambda b: (0, b)) if nlead == 1 else (lambda b: (0, 0, b)),
            memory_space=pltpu.VMEM)

    def kernel(*refs):
        ins, outs = refs[:len(in_plan)], refs[len(in_plan):]
        vals = {key: r[:] for key, r in zip(in_plan, ins)}
        alpha = [vals.get(("alpha", i), vals.get(("alpha_slim", i)))
                 for i in range(t)]
        beta = [vals.get(("beta", i)) for i in range(t)]
        pend_a = [vals.get(("pend_a", i)) for i in range(t)]
        pend_b = [vals.get(("pend_b", i)) for i in range(t)]
        llr = vals.get(("llr", None))
        pm = vals[("pm", None)]
        alpha2, pend_a2, beta2, pend_b2, pm2 = super_kernel_fn(
            llr, alpha, pend_a, beta, pend_b, pm)
        result = {"alpha": alpha2, "alpha_slim": alpha2, "pend_a": pend_a2,
                  "beta": beta2, "pend_b": pend_b2}
        for (kind, i), r in zip(out_plan, outs):
            if kind == "pm":
                r[:] = pm2
            elif kind == "alpha_slim":  # invariant plane: one slab
                r[:] = result[kind][i][:1]
            else:
                r[:] = result[kind][i]

    def fn(llr_nb, alpha, pend_a, beta, pend_b, pm):
        B = pm.shape[-1]
        if B % batch_tile != 0:
            return super_xla_fn(llr_nb, alpha, pend_a, beta, pend_b, pm)
        full = {"llr": {None: llr_nb}, "alpha": dict(enumerate(alpha)),
                "pend_a": dict(enumerate(pend_a)),
                "beta": dict(enumerate(beta)),
                "pend_b": dict(enumerate(pend_b)), "pm": {None: pm}}
        operands = [full["alpha"][i][:1] if kind == "alpha_slim"
                    else full[kind][i] for kind, i in in_plan]
        outs = pl.pallas_call(
            kernel,
            grid=(B // batch_tile,),
            in_specs=[_block_spec(kind, i) for kind, i in in_plan],
            out_specs=tuple(_block_spec(kind, i, out=True)
                            for kind, i in out_plan),
            out_shape=tuple(
                jax.ShapeDtypeStruct(*_shape_dtype(kind, i, B, out=True))
                for kind, i in out_plan),
            # batch tiles are independent: let Mosaic software-pipeline
            # across grid steps (the serial per-tile dependent chain is
            # the measured decode floor, r5)
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*operands)
        new = {k: dict(v) for k, v in full.items()}
        for (kind, i), o in zip(out_plan, outs):
            if kind == "alpha_slim":
                # path-invariant plane: lazy re-broadcast — readers are
                # invariant [:1] slices, so this never materializes in
                # the straight-line controls.  Live-width keeps the true
                # [1, M, B] plane (no broadcast needed).
                new["alpha"][i] = (o if widths is not None
                                   else jnp.broadcast_to(
                                       o, (Lsz,) + o.shape[1:]))
            else:
                new[kind][i] = o
        # reset-only pendings never enter the kernel: their final value is
        # the identity, written here as a free JAX-level broadcast
        if eye_a or eye_b:
            for i in eye_a:
                new["pend_a"][i] = _pend_identity(lv_in, B, dtype,
                                                  perm_impl)
            for i in eye_b:
                new["pend_b"][i] = _pend_identity(lv_out, B, dtype,
                                                  perm_impl)
        return (tuple(new["alpha"][i] for i in range(t)),
                tuple(new["pend_a"][i] for i in range(t)),
                tuple(new["beta"][i] for i in range(t)),
                tuple(new["pend_b"][i] for i in range(t)),
                new["pm"][None])

    return fn


def make_last_superchunk_pallas(flags: np.ndarray, t: int, sizes, Lsz: int,
                                dtype, leaf_impl: str = "onehot",
                                batch_tile: int = 128,
                                interpret: bool = False,
                                perm_impl: str = "onehot",
                                node_mode: str = "exact",
                                transform: bool = False):
    """Fused LAST chunk (``scanscl._make_last_fn``): one kernel produces
    the full root beta plane ``[L, N, B] int8`` + final metrics.
    ``transform=True`` also fuses the final butterfly ``u = β·G`` into the
    kernel (VMEM XORs; the plane returned is u in bit-reversed storage)."""
    flags = np.asarray(flags, bool)
    assert perm_impl in ("onehot", "rank"), perm_impl
    rank = perm_impl == "rank"
    assert node_mode == "exact" or rank, \
        "in-kernel node_mode='fast' requires perm_impl='rank'"
    N = sizes[0]
    body_kernel = _make_chunk_body(
        flags, Lsz, dtype, leaf_impl,
        algebra=_RANK_LOOP_ALGEBRA if rank else _LOOP_ALGEBRA,
        node_mode=node_mode)
    last_kernel_fn = _make_last_fn(
        t, sizes, Lsz, dtype, body_kernel,
        algebra=_SUPER_RANK_ALGEBRA if rank else _SUPER_ALGEBRA,
        transform=transform)
    xla_algebra = rank_algebra_for(Lsz) if rank else None
    body_xla = _make_chunk_body(flags, Lsz, dtype, leaf_impl,
                                algebra=xla_algebra, node_mode=node_mode)
    last_xla_fn = _make_last_fn(t, sizes, Lsz, dtype, body_xla,
                                algebra=xla_algebra, transform=transform)

    needs_llr = t == 1
    in_plan = ([("llr", None)] if needs_llr else [("alpha", t - 2)]) \
        + ([("pend_a", t - 2)] if t >= 2 else []) \
        + [("beta", i) for i in range(t)] \
        + [("pend_b", i) for i in range(t)] \
        + [("pm", None)]
    out_plan = [("root", None), ("pm", None)]

    def _shape_dtype(kind, i, B):
        if kind == "llr":
            return (N, B), dtype
        if kind == "root":
            return (Lsz, N, B), jnp.int8
        if kind == "alpha":
            return (Lsz, sizes[i + 1], B), dtype
        if kind == "beta":
            return (Lsz, sizes[i + 1], B), jnp.int8
        if kind == "pm":
            return (Lsz, B), dtype
        if rank:  # pend_a / pend_b as int32 rank vectors
            return (Lsz, B), jnp.int32
        return (Lsz, Lsz, B), dtype

    def _block_spec(kind, i):
        shape, _ = _shape_dtype(kind, i, batch_tile)
        nlead = len(shape) - 1
        return pl.BlockSpec(
            shape,
            (lambda b: (0, b)) if nlead == 1 else (lambda b: (0, 0, b)),
            memory_space=pltpu.VMEM)

    def kernel(*refs):
        ins, outs = refs[:len(in_plan)], refs[len(in_plan):]
        vals = {key: r[:] for key, r in zip(in_plan, ins)}
        alpha = [vals.get(("alpha", i)) for i in range(t)]
        beta = [vals[("beta", i)] for i in range(t)]
        pend_a = [vals.get(("pend_a", i)) for i in range(t)]
        pend_b = [vals[("pend_b", i)] for i in range(t)]
        root, pm2 = last_kernel_fn(vals.get(("llr", None)), alpha, pend_a,
                                   beta, pend_b, vals[("pm", None)])
        outs[0][:] = root
        outs[1][:] = pm2

    def fn(llr_nb, alpha, pend_a, beta, pend_b, pm):
        B = pm.shape[-1]
        if B % batch_tile != 0:
            return last_xla_fn(llr_nb, alpha, pend_a, beta, pend_b, pm)
        full = {"llr": {None: llr_nb}, "alpha": dict(enumerate(alpha)),
                "pend_a": dict(enumerate(pend_a)),
                "beta": dict(enumerate(beta)),
                "pend_b": dict(enumerate(pend_b)), "pm": {None: pm}}
        operands = [full[kind][i] for kind, i in in_plan]
        return pl.pallas_call(
            kernel,
            grid=(B // batch_tile,),
            in_specs=[_block_spec(kind, i) for kind, i in in_plan],
            out_specs=tuple(_block_spec(kind, i) for kind, i in out_plan),
            out_shape=tuple(
                jax.ShapeDtypeStruct(*_shape_dtype(kind, i, B))
                for kind, i in out_plan),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*operands)

    return fn
