"""Fully-fused LDPC BP decode as one Pallas TPU kernel.

The XLA decoder (``models/ldpc/bp.py``) issues ~10 HBM-roundtrip ops per
iteration; this kernel keeps *all* state — per-slot message planes and the
one-hot edge-permutation tensor — resident in VMEM for the entire decode,
so the only HBM traffic is the LLRs in and the bits out.

Layout (per ``TannerGraph``'s dense padded-edge design, ``graph.py``):

* var-major messages: ``dv_max`` planes of ``[Bt, n]`` (slot-major);
* check-major messages: ``dc_max`` planes of ``[Bt, m]``;
* the two layouts are linked by ``P[s', s, v, c] = 1`` iff check *c*'s
  slot-*s* edge is variable *v*'s slot-*s'* edge.  The var→check move is
  ``C_s = Σ_{s'} V_{s'} @ P[s',s]`` (MXU, exact: each output column sums
  exactly one message) and the reverse direction reuses the *same* tensor
  with the contraction on the other axis — no second permutation tensor.
* syndrome: ``parity = (bits @ H) mod 2``; per-frame convergence latching
  matches the XLA decoder (first converged bits + true iteration count),
  and once every frame in the tile converged the remaining iterations are
  predicated off with ``pl.when``.

Numerics are the exact reference semantics (tanh clip ±0.999999,
leave-one-out via exclusive products, total−self variable update,
``total ≤ 0 → 1``), so outputs are bit-identical to ``models/ldpc/bp.py``
in float32 (pinned by tests).

VMEM budget: the permutation tensor is ``dv·dc·n·m`` f32 — ~9 MB for the
flagship n=504 code.  ``pallas_supported()`` gates on it; larger codes use
the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ldpc.graph import TannerGraph

_TANH_CLIP = 0.999999
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except ImportError:
        return False


def pallas_supported(graph: TannerGraph, batch_tile: int = 128,
                     schedule: str = "flooding",
                     num_layers: int = 4) -> bool:
    """True when the fused kernel's VMEM working set fits."""
    if not pallas_available():
        return False
    if schedule == "layered":
        # layer-major permutation tensor [G, dv, dc, n, mpad]
        from ..models.ldpc.layered import layer_bounds

        bounds = layer_bounds(graph.m, num_layers)
        mpad = -(-max(c1 - c0 for c0, c1 in bounds) // 128) * 128
        perm = len(bounds) * graph.dv_max * graph.dc_max * graph.n * mpad * 4
        msgs = batch_tile * (graph.n
                             + len(bounds) * graph.dc_max * mpad) * 4
    else:
        perm = graph.dv_max * graph.dc_max * graph.n * graph.m * 4
        msgs = batch_tile * (graph.dv_max * graph.n
                             + graph.dc_max * graph.m) * 4
    work = batch_tile * graph.n * 4 * 4
    return perm + msgs + work <= _VMEM_BUDGET_BYTES


def resolve_bp_impl(graph: TannerGraph, xla_decode, max_iter: int,
                    early_stop: bool, dtype, impl: str = "auto",
                    batch_tile: int = 128, jit_pallas: bool = False,
                    check_rule: str = "bp", normalization: float = 1.0,
                    offset: float = 0.0, schedule: str = "flooding",
                    num_layers: int = 4):
    """Single source of truth for the BP fast-path policy (used by
    ``BPDecoder`` and ``sim.pipelines.make_ldpc_pipeline``).

    Returns ``(decode_fn, resolved_impl, pallas_fn_or_None)``:
    ``decode_fn(llr [B, n]) -> (bits, iters)`` pads unaligned batches to
    the lane tile and runs the fused Pallas kernel when this backend
    supports it (TPU, float32, edge tensors fit VMEM), else the given
    XLA decode.  ``impl="xla"`` forces the portable path; ``"pallas"``
    raises when unavailable; ``"auto"`` silently falls back.
    """
    import jax

    supported = (impl in ("pallas", "auto")
                 and pallas_supported(graph, batch_tile, schedule, num_layers)
                 and jax.default_backend() == "tpu"
                 and dtype == jnp.float32)
    if not supported:
        if impl == "pallas":
            raise ValueError(
                "pallas BP unavailable: needs a TPU backend, float32, and "
                "a code whose edge tensors fit VMEM")
        return xla_decode, "xla", None
    pallas_fn = make_bp_decoder_pallas(graph, max_iter, early_stop,
                                       batch_tile, check_rule=check_rule,
                                       normalization=normalization,
                                       offset=offset, schedule=schedule,
                                       num_layers=num_layers)
    if jit_pallas:
        pallas_fn = jax.jit(pallas_fn)

    def decode(llr):
        B = llr.shape[0]
        pad = (-B) % batch_tile
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, llr.shape[1]), llr.dtype)], axis=0)
        bits, iters = pallas_fn(llr)
        return bits[:B], iters[:B]

    return decode, "pallas", pallas_fn


def _build_perm_tensor(graph: TannerGraph) -> np.ndarray:
    """P [dv, dc, n, m] one-hot edge permutation (see module docstring)."""
    dv, dc, n, m = graph.dv_max, graph.dc_max, graph.n, graph.m
    P = np.zeros((dv, dc, n, m), np.float32)
    cv = np.asarray(graph.cv_gather)      # [m, dc] flat var-major index v*dv+s'
    mask = np.asarray(graph.check_mask)   # [m, dc]
    for c in range(m):
        for s in range(dc):
            if mask[c, s]:
                flat = int(cv[c, s])
                v, sp = flat // dv, flat % dv
                P[sp, s, v, c] = 1.0
    return P


def make_bp_decoder_pallas(
    graph: TannerGraph,
    max_iter: int = 20,
    early_stop: bool = True,
    batch_tile: int = 128,
    interpret: bool = False,
    check_rule: str = "bp",
    normalization: float = 1.0,
    offset: float = 0.0,
    schedule: str = "flooding",
    num_layers: int = 4,
):
    """Build the fused decoder: ``decode(llr [B, n]) → (bits int8 [B, n],
    iters int32 [B])``.  B must be a multiple of ``batch_tile`` (the public
    wrapper pads).

    ``check_rule="bp"`` is the sum-product update (tanh/atanh, reference
    ``decoder.py:62-96``); ``"ms"`` is the min-sum family (sign-product ×
    leave-one-out min magnitude, reference ``decoder.py:257-287``) with the
    NMS ``normalization`` α and OMS ``offset`` β knobs — bit-identical to
    ``models/ldpc/minsum.ms_check_update`` in float32 (sign products and
    mins are association-free, so the in-kernel sequential pre/suffix
    sweeps reproduce the XLA ``associative_scan`` exactly).

    ``schedule="layered"`` (min-sum only) runs the row-layered serving
    schedule of ``models/ldpc/layered.py``: per contiguous check layer,
    v2c recomputes from the live totals (``Q[v] − R_old``), the min-sum
    update refreshes that layer's R planes, and the totals absorb the
    deltas through per-slot one-hot matmul moves — exact single-edge
    selections, so the kernel is bit-identical to the XLA layered decoder
    and its float64 NumPy twin semantics."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if check_rule not in ("bp", "ms"):
        raise ValueError(f"unknown check_rule {check_rule!r}")
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    layered = schedule == "layered"
    if layered:
        assert check_rule == "ms", "layered schedule is min-sum only"
        from ..models.ldpc.layered import layer_bounds

        bounds = layer_bounds(graph.m, num_layers)
        # Mosaic cannot slice the minor (lane) dim at non-128 offsets
        # (lowers through an unsupported >2D gather), so the per-layer
        # tensors are REPACKED layer-major: P_lay [G, dv, dc, n, mpad]
        # indexed by leading ints only.  mpad = widest layer, lane-padded.
        mpad = max(c1 - c0 for c0, c1 in bounds)
        mpad = -(-mpad // 128) * 128
    g = graph
    dv, dc, n, m = g.dv_max, g.dc_max, g.n, g.m
    Bt = batch_tile
    P_host = _build_perm_tensor(g)
    H_host = np.zeros((n, m), np.float32)  # H^T as [n, m]
    cv = np.asarray(g.check_vars)
    cmask_host = np.asarray(g.check_mask)
    for c in range(m):
        for s in range(dc):
            if cmask_host[c, s]:
                H_host[int(cv[c, s]), c] = 1.0
    cmask_f = cmask_host.T.astype(np.float32)          # [dc, m]
    vmask_f = np.asarray(g.var_mask).T.astype(np.float32)  # [dv, n]
    if layered:
        # layer-major repack (see _layered_iteration): padded columns have
        # no P ones and a zero mask, so they contribute exact zeros
        G = len(bounds)
        P_lay = np.zeros((G, dv, dc, n, mpad), np.float32)
        cmask_lay = np.zeros((G, dc, mpad), np.float32)
        for gi, (c0, c1) in enumerate(bounds):
            P_lay[gi, :, :, :, : c1 - c0] = P_host[:, :, :, c0:c1]
            cmask_lay[gi, :, : c1 - c0] = cmask_f[:, c0:c1]
        P_host, cmask_f = P_lay, cmask_lay

    def kernel(llr_ref, P_ref, H_ref, cmask_ref, vmask_ref,
               bits_ref, iters_ref,
               V, C, latched, done, state):
        llr = llr_ref[:]                       # [Bt, n]
        cmask = cmask_ref[:]                   # [dc, m] / layered [G, dc, mpad]
        vmask = vmask_ref[:]                   # [dv, n]
        if layered:
            V[0] = llr                         # running totals Q
            for gi in range(len(bounds)):      # R (c2v) storage
                for s in range(dc):
                    C[gi, s] = jnp.zeros((Bt, mpad), jnp.float32)
        else:
            for sp in range(dv):
                V[sp] = llr                    # init v2c = channel LLR
        # initial hard decision (iteration-0 bits, decoder.py:139-148)
        latched[:] = (llr <= 0).astype(jnp.float32)
        done[:] = jnp.zeros((Bt, 1), jnp.float32)
        iters_ref[:] = jnp.full((Bt, 1), max_iter, jnp.int32)
        state[0, 0] = 0  # all_done flag

        def _layered_iteration():
            # row-layered min-sum (models/ldpc/layered.py semantics):
            # per layer, v2c from the LIVE totals, min-sum refresh of the
            # layer's R planes, totals absorb the deltas via per-slot
            # one-hot matmul moves (exact single-edge selections → bit-
            # identical to the XLA decoder and the float64 twin).  All
            # per-layer tensors are LAYER-MAJOR (P_ref [G, dv, dc, n,
            # mpad], C scratch [G, dc, Bt, mpad]) so every access indexes
            # leading dims with static ints — Mosaic rejects minor-dim
            # slices at non-lane-aligned offsets (>2D gather).
            inf = jnp.float32(jnp.inf)
            for gi in range(len(bounds)):
                Q = V[0]
                sgs, mgs, r_olds = [], [], []
                for s in range(dc):
                    acc = jnp.zeros((Bt, mpad), jnp.float32)
                    for sp in range(dv):
                        acc += jax.lax.dot_general(
                            Q, P_ref[gi, sp, s],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    r_old = C[gi, s]
                    qt = acc - r_old
                    on = cmask[gi, s][None, :] > 0
                    r_olds.append(r_old)
                    sgs.append(jnp.where(on, jnp.sign(qt), 1.0))
                    mgs.append(jnp.where(on, jnp.abs(qt), inf))
                pre_s = [None] * dc
                suf_s = [None] * dc
                pre_m = [None] * dc
                suf_m = [None] * dc
                run = jnp.ones((Bt, mpad), jnp.float32)
                for s in range(dc):
                    pre_s[s] = run
                    run = run * sgs[s]
                run = jnp.ones((Bt, mpad), jnp.float32)
                for s in range(dc - 1, -1, -1):
                    suf_s[s] = run
                    run = run * sgs[s]
                run = jnp.full((Bt, mpad), inf, jnp.float32)
                for s in range(dc):
                    pre_m[s] = run
                    run = jnp.minimum(run, mgs[s])
                run = jnp.full((Bt, mpad), inf, jnp.float32)
                for s in range(dc - 1, -1, -1):
                    suf_m[s] = run
                    run = jnp.minimum(run, mgs[s])
                deltas = []
                for s in range(dc):
                    mg_min = jnp.minimum(pre_m[s], suf_m[s])
                    if offset:
                        mg_min = jnp.maximum(
                            mg_min - jnp.float32(offset), 0.0)
                    out = (pre_s[s] * suf_s[s]) * mg_min
                    out = out * jnp.float32(normalization)
                    on = cmask[gi, s][None, :] > 0
                    r_new = jnp.where(
                        on & jnp.isfinite(out), out, 0.0)
                    deltas.append(r_new - r_olds[s])
                    C[gi, s] = r_new
                for sp in range(dv):
                    accq = jnp.zeros((Bt, n), jnp.float32)
                    for s in range(dc):
                        accq += jax.lax.dot_general(
                            deltas[s], P_ref[gi, sp, s],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    V[0] = V[0] + accq
            return V[0]

        def iteration(it, _):
            @pl.when(state[0, 0] == 0)
            def _():
                # --- check-node update ---------------------------------------
                if layered:
                    pass
                elif check_rule == "bp":
                    # sum-product (decoder.py:62-96)
                    ts = []
                    for s in range(dc):
                        acc = jnp.zeros((Bt, m), jnp.float32)
                        for sp in range(dv):
                            acc += jax.lax.dot_general(
                                V[sp], P_ref[sp, s],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        t = jnp.clip(jnp.tanh(acc * 0.5),
                                     -_TANH_CLIP, _TANH_CLIP)
                        ts.append(jnp.where(cmask[s][None, :] > 0, t, 1.0))
                    # exclusive products over the dc slots (no division)
                    pre = [None] * dc
                    suf = [None] * dc
                    run = jnp.ones((Bt, m), jnp.float32)
                    for s in range(dc):
                        pre[s] = run
                        run = run * ts[s]
                    run = jnp.ones((Bt, m), jnp.float32)
                    for s in range(dc - 1, -1, -1):
                        suf[s] = run
                        run = run * ts[s]
                    for s in range(dc):
                        prod = jnp.clip(pre[s] * suf[s],
                                        -_TANH_CLIP, _TANH_CLIP)
                        # Mosaic has no atanh primitive; this is XLA's own
                        # lowering (atanh = (log1p(x) − log1p(−x))/2), so the
                        # result stays bit-identical to the XLA decoder
                        C[s] = jnp.log1p(prod) - jnp.log1p(-prod)
                else:
                    # min-sum family (decoder.py:257-287; minsum.py):
                    # sign(0)=0 zero-propagation preserved; masked slots are
                    # the identities (sign 1, magnitude +inf); a fully-masked
                    # leave-one-out (degree-1 row) yields ±inf/NaN → 0,
                    # matching the XLA path's nan_to_num.
                    inf = jnp.float32(jnp.inf)
                    sgs, mgs = [], []
                    for s in range(dc):
                        acc = jnp.zeros((Bt, m), jnp.float32)
                        for sp in range(dv):
                            acc += jax.lax.dot_general(
                                V[sp], P_ref[sp, s],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        on = cmask[s][None, :] > 0
                        sgs.append(jnp.where(on, jnp.sign(acc), 1.0))
                        mgs.append(jnp.where(on, jnp.abs(acc), inf))
                    pre_s = [None] * dc
                    suf_s = [None] * dc
                    pre_m = [None] * dc
                    suf_m = [None] * dc
                    run = jnp.ones((Bt, m), jnp.float32)
                    for s in range(dc):
                        pre_s[s] = run
                        run = run * sgs[s]
                    run = jnp.ones((Bt, m), jnp.float32)
                    for s in range(dc - 1, -1, -1):
                        suf_s[s] = run
                        run = run * sgs[s]
                    run = jnp.full((Bt, m), inf, jnp.float32)
                    for s in range(dc):
                        pre_m[s] = run
                        run = jnp.minimum(run, mgs[s])
                    run = jnp.full((Bt, m), inf, jnp.float32)
                    for s in range(dc - 1, -1, -1):
                        suf_m[s] = run
                        run = jnp.minimum(run, mgs[s])
                    for s in range(dc):
                        mg = jnp.minimum(pre_m[s], suf_m[s])
                        if offset:
                            mg = jnp.maximum(mg - jnp.float32(offset), 0.0)
                        out = (pre_s[s] * suf_s[s]) * mg
                        out = out * jnp.float32(normalization)
                        C[s] = jnp.where(jnp.isfinite(out), out, 0.0)
                if layered:
                    bits = (_layered_iteration() <= 0).astype(jnp.float32)
                else:
                    # --- variable-node update (decoder.py:98-122) -----------
                    c2v = []
                    for sp in range(dv):
                        acc = jnp.zeros((Bt, n), jnp.float32)
                        for s in range(dc):
                            acc += jax.lax.dot_general(
                                C[s], P_ref[sp, s],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        c2v.append(
                            jnp.where(vmask[sp][None, :] > 0, acc, 0.0))
                    totals = llr
                    for sp in range(dv):
                        totals = totals + c2v[sp]
                    for sp in range(dv):
                        V[sp] = totals - c2v[sp]
                    bits = (totals <= 0).astype(jnp.float32)
                # --- syndrome + per-frame latching (decoder.py:191-202) -----
                if early_stop:
                    sums = jax.lax.dot_general(
                        bits, H_ref[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    parity = sums - 2.0 * jnp.floor(sums * 0.5)
                    ok = (jnp.sum(parity, axis=1, keepdims=True) == 0
                          ).astype(jnp.float32)                 # [Bt, 1]
                    newly = ok * (1.0 - done[:])
                    latched[:] = jnp.where(newly > 0, bits, latched[:])
                    iters_ref[:] = jnp.where(
                        newly > 0, jnp.full((Bt, 1), it + 1, jnp.int32),
                        iters_ref[:])
                    done[:] = jnp.maximum(done[:], ok)
                    state[0, 0] = (jnp.sum(done[:]) == Bt).astype(jnp.int32)
                    # non-converged frames report the latest bits
                    latched[:] = jnp.where(done[:] > 0, latched[:], bits)
                else:
                    # reference early_stop=False: final bits, iters=max_iter
                    latched[:] = bits
            return 0

        jax.lax.fori_loop(0, max_iter, iteration, 0)
        bits_ref[:] = latched[:].astype(jnp.int8)

    def decode(llr):
        llr = jnp.asarray(llr, jnp.float32)
        B = llr.shape[0]
        assert B % Bt == 0, f"batch {B} must be a multiple of tile {Bt}"
        full = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array spec
            shape, lambda i, _s=shape: (0,) * len(_s),
            memory_space=pltpu.VMEM)
        bits, iters = pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            in_specs=[
                pl.BlockSpec((Bt, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                full(P_host.shape),
                full((n, m)),
                full(cmask_f.shape),
                full((dv, n)),
            ],
            out_specs=[
                pl.BlockSpec((Bt, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, n), jnp.int8),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, Bt, n) if layered else (dv, Bt, n),
                           jnp.float32),
                pltpu.VMEM((len(bounds), dc, Bt, mpad) if layered
                           else (dc, Bt, m), jnp.float32),
                pltpu.VMEM((Bt, n), jnp.float32),
                pltpu.VMEM((Bt, 1), jnp.float32),
                pltpu.SMEM((1, 1), jnp.int32),
            ],
            interpret=interpret,
        )(llr, jnp.asarray(P_host), jnp.asarray(H_host),
          jnp.asarray(cmask_f), jnp.asarray(vmask_f))
        return bits, iters[:, 0]

    return decode
