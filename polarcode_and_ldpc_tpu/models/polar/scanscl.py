"""Chunk-scan SCL decoder — compile-light, lane-efficient fast path.

Two structural problems cap the unrolled decoder's (``fastscl.py``)
throughput on TPU:

1. **compile scale** — it emits O(N) distinct XLA ops and its compile time
   grows with N *and* batch (measured ~101 s for SCL-8 N=1024 at batch 512
   on v5e, ~8 min for N=4096 SCL-32), capping the usable batch size;
2. **lane waste** — its ``[batch, L, M]`` layout puts the subtree width M
   (1…N, mostly ≤ 64) on the 128-lane axis, so most vector slots idle;
   measured per-frame decode cost is nearly batch-independent, i.e. the
   work is layout-inflated, not op-overhead-bound.

This module restructures the same algorithm around both problems:

* **batch-last layout**: every tensor carries the frame batch on the
  trailing (lane) axis — alphas ``[L, M, B]``, metrics ``[L, B]``,
  one-hot selections ``[L, L, B]``.  All ops are elementwise over B, so
  lanes are always full; list/one-hot algebra runs as static L-term
  broadcast loops (never ``dot_general``, which could re-transpose);
* **bit-reversed storage**: the channel LLRs are permuted once so every
  even/odd deinterleave of the natural-order recursion becomes a
  contiguous half-split, and the leaf visit order in storage equals the
  reference's bit-reversed decode order (``src/polar/decoder.py:54-55``);
* **chunk scan**: the code tree is cut at subtree size ``S``; a
  ``lax.scan`` walks the ``C = N/S`` chunks in DFS order, dispatching one
  specialized body per *unique* chunk frozen pattern (``lax.switch``) —
  compile cost scales with the number of pattern classes (polarization
  subchannel classes), not with N or batch;
* **semi-parallel stage stack**: between chunks, alphas/left-betas for the
  outer levels 1..t (t = log2 C) live in fixed-shape per-level arrays.
  The per-chunk descend program is fully determined by ctz(c) and the
  ascend by ctz(c+1), so each is ONE ``lax.switch`` over t straight-line
  variants — three control ops per chunk total (TPU conditionals cost
  ~ms-scale pipeline barriers; a per-level cond chain was the dominant
  fixed overhead at small chunk sizes);
* **lazy list permutations**: pruning at info leaves permutes the list
  axis of all live state.  Each outer level keeps a *pending* one-hot
  permutation, composed with the chunk's relative permutation after every
  chunk; stored state is refreshed on the fly only when a schedule event
  actually reads it, and pendings reset to identity on writes — keeping
  the unrolled decoder's O(L²·N·log) one-hot traffic instead of the
  O(L²·N·C) an eager whole-stack permute would cost.

Outputs are bit-exact with the reference-semantics twin
(``parity/polar_np.scl_decode_np``) and ``scl.make_scl_decoder``: identical
leaf visit order, identical candidate ordering and stable tie-breaking
(``src/polar/decoder.py:299-307``), identical −inf phantom-path handling.

Reference semantics: ``/root/reference/src/polar/decoder.py:176-444``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from .construction import bit_reverse_permutation
from .encoder import polar_transform
from .trellis import f_minsum

_NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# batch-last one-hot list algebra
#
# Selections/permutations are one-hot tensors P [L_out, L_in, B]:
# out[l, b] selects in[j, b] where P[l, j, b] = 1.  Applications and
# compositions are static loops of elementwise broadcast multiply-adds —
# full-lane VPU work; exact for one-hot P and finite operands.
# ---------------------------------------------------------------------------

def _d0_d1(a):
    """(log P(0|llr), log P(1|llr)) — reference ``decoder.py:374-406``.

    Algebraically ``(−logaddexp(0, −a), −logaddexp(0, a))``, written with
    the shared ``log1p(exp(−|a|))`` term explicit: ``logaddexp(x, y) =
    max(x, y) + log1p(exp(−|x−y|))`` and both calls share ``|0−(±a)| =
    |a|``, so this is the *same float computation* (bit-identical, ±inf
    included) with ONE exp/log1p pair instead of two — XLA would CSE the
    duplicate anyway, the Pallas kernels are not guaranteed to."""
    t = jnp.log1p(jnp.exp(-jnp.abs(a)))
    zero = jnp.zeros_like(a)
    return (-(jnp.maximum(zero, -a) + t), -(jnp.maximum(zero, a) + t))


def _apply_perm(P, x):
    """``P [L, J, B]`` applied to ``x [J, M, B]`` → ``[L, M, B]``.

    Broadcast-multiply + reduce (XLA fuses into one loop): batch stays on
    lanes; never lowered through ``dot_general`` (which could re-transpose
    to a batch-first layout)."""
    return jnp.sum(P[:, :, None, :] * x[None], axis=1)


def _apply_perm_bits(P, bits):
    """One-hot apply on int8 0/1 planes (exact via f32 accumulate)."""
    return _apply_perm(P, bits.astype(P.dtype)).astype(jnp.int8)


def _compose(A, B):
    """Composition (apply B first, then A): ``C[l,k,b] = Σ_j A[l,j,b]·B[j,k,b]``."""
    return jnp.sum(A[:, :, None, :] * B[None], axis=1)


def _cand_ranks(cand):
    """Stable-descending rank of each candidate ``cand [2L, B]`` — the
    reference's ordering (sort by metric desc, ties by candidate index;
    Python stable sort, ``decoder.py:306-307``).

    Index tensors come from ``lax.broadcasted_iota`` (not broadcast
    ``arange``/``tril`` constants) so the identical code traces both under
    XLA and inside the Pallas chunk-body kernel (Mosaic rejects
    leading-dim iota/const broadcasts)."""
    two_l = cand.shape[0]
    gt = cand[None, :, :] > cand[:, None, :]            # [i, j, B]: cand_j > cand_i
    eq = cand[None, :, :] == cand[:, None, :]
    shape3 = (two_l, two_l, cand.shape[1])
    jlti = (lax.broadcasted_iota(jnp.int32, shape3, 1)
            < lax.broadcasted_iota(jnp.int32, shape3, 0))  # j < i
    before = gt | (eq & jlti)
    return jnp.sum(before, axis=1, dtype=jnp.int32)      # [2L, B]


def _stable_topk_onehot(cand, Lsz):
    """Stable-descending top-L selection one-hot ``S [L, 2L, B]`` over
    candidates ``cand [2L, B]`` (ordering per ``_cand_ranks``)."""
    two_l = cand.shape[0]
    rank = _cand_ranks(cand)
    sshape = (Lsz, two_l, cand.shape[1])
    slots = lax.broadcasted_iota(jnp.int32, sshape, 0)
    return (jnp.broadcast_to(rank[None, :, :], sshape) == slots).astype(cand.dtype)


def _sel_metrics(S, cand):
    """Select metrics ``[2L, B] → [L, B]`` by one-hot ``S [L, 2L, B]``.
    Masked sum, not matmul: −inf phantoms would poison ``0 × (−inf)``."""
    return jnp.sum(jnp.where(S != 0, cand[None, :, :], 0), axis=1)


def _info_leaf(a, pm, Lsz, leaf_impl: str = "onehot"):
    """Branch + stable top-L prune at one info leaf (``decoder.py:283-339``).

    ``a [lv, B]`` leaf LLRs, ``pm [lv, B]`` → (bit plane ``[lv', 1, B]``
    int8, pm, R ``[lv', lv, B]``) with ``lv' = min(2·lv, Lsz)``.

    Width-generic (live-width decoding): ``lv`` is the number of LIVE
    paths — when ``lv < Lsz`` no candidate is discarded, only rank-
    reordered, and the output widens.  At ``lv = Lsz`` this is the
    standard top-L prune.  Slot order matches the full-width −inf-phantom
    program exactly for finite LLRs: finite candidates always outrank
    the −inf phantoms, and rank among themselves identically.

    ``leaf_impl="onehot"`` ranks candidates by an all-pairs comparison;
    ``"sort"`` uses a stable two-operand ``lax.sort`` along the candidate
    (sublane) axis — fewer element-ops, same reference ordering (stable
    sort keeps candidate-index order on ties; finite sums never produce
    −0.0, so the sort's total order agrees with the comparator)."""
    lv = pm.shape[0]
    out = min(2 * lv, Lsz)
    d0, d1 = _d0_d1(a)
    cand = jnp.concatenate([pm + d0, pm + d1], axis=0)  # [2·lv, B]
    if leaf_impl == "sort":
        idx = lax.broadcasted_iota(jnp.int32, cand.shape, 0)
        sorted_neg, sorted_idx = lax.sort(
            (-cand, idx), dimension=0, is_stable=True, num_keys=1)
        top_idx = sorted_idx[:out]           # [lv', B] — candidate per slot
        pm2 = -sorted_neg[:out]
        bits = (top_idx >= lv).astype(jnp.int8)
        src = top_idx % lv
        R = (src[:, None, :]
             == jnp.arange(lv, dtype=jnp.int32)[None, :, None]).astype(
                 cand.dtype)
        return bits[:, None, :], pm2, R
    S2 = _stable_topk_onehot(cand, out)
    pm2 = _sel_metrics(S2, cand)
    bits = jnp.sum(S2[:, lv:, :], axis=1).astype(jnp.int8)
    R = S2[:, :lv, :] + S2[:, lv:, :]
    return bits[:, None, :], pm2, R


def _prune_2l(cand, Lsz, leaf_impl: str = "onehot"):
    """Stable top-L prune over ordered candidates ``cand [2L, B]`` (first
    half = "keep/bit-0" candidates, second half = "flip/bit-1").  Returns
    ``(pm [L, B], second [L, B] ∈ {0,1} in cand.dtype, R [L, L, B])`` —
    the selected metrics, a second-half indicator per surviving slot, and
    the list permutation.  Same ordering/tie rules as ``_info_leaf``
    (stable descending; ties prefer the lower candidate index)."""
    if leaf_impl == "sort":
        idx = lax.broadcasted_iota(jnp.int32, cand.shape, 0)
        sorted_neg, sorted_idx = lax.sort(
            (-cand, idx), dimension=0, is_stable=True, num_keys=1)
        top_idx = sorted_idx[:Lsz]
        pm2 = -sorted_neg[:Lsz]
        second = (top_idx >= Lsz).astype(cand.dtype)
        src = top_idx % Lsz
        R = (src[:, None, :]
             == jnp.arange(Lsz, dtype=jnp.int32)[None, :, None]).astype(
                 cand.dtype)
        return pm2, second, R
    S2 = _stable_topk_onehot(cand, Lsz)
    pm2 = _sel_metrics(S2, cand)
    second = jnp.sum(S2[:, Lsz:, :], axis=1)
    R = S2[:, :Lsz, :] + S2[:, Lsz:, :]
    return pm2, second, R


def _tree_sum(x, axis: int = 1):
    """Deterministic halving-tree reduction along ``axis`` (power-of-two
    extent).  Used instead of ``jnp.sum`` wherever the NumPy twin must
    reproduce the float addition order bit-exactly (XLA reduce order is
    unspecified)."""
    n = x.shape[axis]
    while n > 1:
        h = n // 2
        x = (lax.slice_in_dim(x, 0, h, axis=axis)
             + lax.slice_in_dim(x, h, n, axis=axis))
        n = h
    return jnp.squeeze(x, axis=axis)


def _leaf_llrs_zero_dec(alpha, roll_rows=None):
    """All leaf LLRs of a subtree under all-zero decisions, level-parallel.

    ``alpha [L, M, B] → y [L·M, B]`` (storage order per path block): with
    every decided bit 0 the g update degenerates to ``second + first``, so
    the whole f/g recursion has no cross-node data dependence — every node
    of a level computes in ONE full-width op instead of the serial
    recursion's per-node padded-tile ops (the round-3 breakdown showed the
    frozen-side recursion as a large share of the all-frozen floor).  The
    float expressions are IDENTICAL to the serial recursion's (only
    independent nodes are reordered), so results are bit-exact.

    The flat 2D + reshape-(rows//m, m, B) forms mirror
    ``ops/sc_mega_pallas._polar_transform_nb`` — proven Mosaic-safe
    in-kernel.  Valid for rate-0 subtrees and for any prefix of leaves
    before the first info decision (e.g. the whole of a repetition
    subtree, whose single info leaf comes last).

    ``roll_rows`` (kernel algebras): at block sizes m ≤ 4 the
    reshape-(R//m, m, B) form degrades to one padded vreg per block —
    the dominant term of the flat pass (round-4 op census).  With a
    sublane-roll primitive the partner rows come from two full-width
    rolls + a static parity select instead: the SAME operand pairs and
    float ops land at the SAME rows (bit-exact; rolled-in wrap values
    are never selected), at full sublane density.  f is computed
    redundantly at g rows (and vice versa) — finite in, finite out, and
    discarded by the select."""
    L, M, B = alpha.shape
    if M == 1:
        return alpha.reshape(L, B)
    z = alpha.reshape(L * M, B)
    R = L * M
    m = M
    iota = None
    while m > 1:
        h = m // 2
        if roll_rows is not None and m <= 4 and R >= 8:
            if iota is None:
                iota = lax.broadcasted_iota(jnp.int32, (R, B), 0)
            first_half = (iota & (m - 1)) < h
            partner = jnp.where(first_half, roll_rows(z, -h),
                                roll_rows(z, h))
            z = jnp.where(first_half, f_minsum(z, partner), z + partner)
        else:
            z3 = z.reshape(R // m, m, B)
            first, second = z3[:, :h, :], z3[:, h:, :]
            z = jnp.concatenate([f_minsum(first, second), second + first],
                                axis=1).reshape(R, B)
        m = h
    return z


#: max subtree width decoded by one flat level-parallel pass; wider
#: rate-0/REP subtrees split through the ordinary f/g recursion first
#: (identical DAG — the split only reorders independent ops).  Caps the
#: pass's in-kernel temporaries: an uncapped S=128 pass pushed a marginal
#: superkernel variant past the 16 MB scoped-VMEM stack (measured r4).
#: ``FEC_LEVELPAR_MAX=1`` disables the flat passes entirely (pure
#: recursion — the bit-identical pre-r4 program), for perf A/Bs.
import os as _os

_LEVELPAR_MAX = int(_os.environ.get("FEC_LEVELPAR_MAX", "64"))


def _rate0_metric_levelpar(alpha, roll_rows=None):
    """Σ log P(0 | leaf llr) over an all-frozen subtree → ``[L, B]``.

    Bit-identical to the serial ``rate0(f(a,b)) + rate0(b + a)`` recursion:
    the leaf LLRs come from the same expressions (``_leaf_llrs_zero_dec``)
    and the adjacent-pair bottom-up reduction below computes the same
    complete-binary-tree addition DAG the recursion's contiguous-halves
    splits unfold to (addition is commutative bitwise; only the
    associativity order matters, and it is preserved)."""
    L, M, B = alpha.shape
    if M > _LEVELPAR_MAX:
        h = M // 2
        first, second = alpha[:, :h, :], alpha[:, h:, :]
        return (_rate0_metric_levelpar(f_minsum(first, second), roll_rows)
                + _rate0_metric_levelpar(second + first, roll_rows))
    s = _d0_d1(_leaf_llrs_zero_dec(alpha, roll_rows))[0]   # [L·M, B]
    rows = L * M
    while rows > L:
        s3 = s.reshape(rows // 2, 2, B)
        s = s3[:, 0, :] + s3[:, 1, :]               # adjacent pairs
        rows //= 2
    return s


def _rows(y, idxs):
    """Static row-gather ``y [R, B] → [len(idxs), B]`` via single-row
    slices + concat (no strided slicing — Mosaic-safe)."""
    return jnp.concatenate([y[i][None] for i in idxs], axis=0)


def _rep_exact(alpha, pm, Lsz, info_leaf, leaf_impl, roll_rows=None):
    """EXACT repetition node (all leaves frozen except the last in decode
    order) — bit-identical to the leaf-by-leaf recursion, restructured:

    * every decision before the final leaf is a frozen 0, so ALL leaf LLRs
      (including the last) compute level-parallel (``_leaf_llrs_zero_dec``);
    * the serial recursion adds the left rate-0 blocks' tree-sums to the
      path metric one by one along the right spine (block j covers storage
      ``[M − M/2^{j−1}, M − M/2^j)``); those block sums are exactly the
      intermediate values of the adjacent-pair reduction of the leaf d0
      array — captured at row ``m − 2`` (per path block) when the
      per-block array size reaches ``m = 2^j``, then added to ``pm`` in
      the same sequential order;
    * the final leaf runs the standard info-leaf prune; the node codeword
      is its bit repeated (ancestors XOR all-zero left betas), and no
      internal permutations are needed (zero planes are perm-invariant).

    ``alpha [L, M, B]``, ``pm [L, B]`` → ``(beta [L, M, B] int8, pm', R)``.
    """
    L, M, B = alpha.shape
    y = _leaf_llrs_zero_dec(alpha, roll_rows)       # [L·M, B]
    d0 = _d0_d1(y)[0]
    captures = []                                   # b_{log2 M} .. b_1
    s, m, rows = d0, M, L * M
    while m >= 2:
        captures.append(_rows(s, [l * m + m - 2 for l in range(L)]))
        if m == 2:
            break
        s3 = s.reshape(rows // 2, 2, B)
        s = s3[:, 0, :] + s3[:, 1, :]
        m //= 2
        rows //= 2
    for b in reversed(captures):                    # pm + b_1 + b_2 + ...
        pm = pm + b
    y_last = _rows(y, [l * M + M - 1 for l in range(L)])
    bits, pm, R = info_leaf(y_last, pm, Lsz, leaf_impl)
    beta = jnp.concatenate([bits.astype(jnp.int8)] * M, axis=1)
    return beta, pm, R


def _rate1_fast(alpha, pm, Lsz, leaf_impl: str = "onehot"):
    """Fast rate-1 (all-info) list node — SSCL semantics (Hashemi et al.,
    "Fast Simplified Successive-Cancellation List Decoding", adapted to
    this framework's log-likelihood metrics; an *approximate* opt-in mode,
    see ``node_mode`` in ``make_scl_decoder_scan``).

    Every position is hard-decided at the node root (``llr ≥ 0 → 0``, the
    reference's leaf rule) and the path metric pays the hard penalty
    ``Σ −logaddexp(0, −|a|)``; then ``K = min(L−1, S)`` branching stages
    walk the least-reliable positions in increasing ``|a|`` order (ties by
    position), each offering every path a flip of its s-th least-reliable
    position at metric cost ``−|a|_(s)`` through the standard stable top-L
    prune.  K = L−1 stages suffice: under hard metrics a path flipping more
    positions can never enter the surviving list (Hashemi Thm. 1).

    ``alpha [L, S, B]``, ``pm [L, B]`` → ``(beta [L, S, B] int8 — the node
    codeword, pm, R [L, L, B])``.  XLA-only (uses ``lax.sort`` and scatter
    forms Mosaic does not support)."""
    S_node, batch = alpha.shape[1], alpha.shape[2]
    dtype = alpha.dtype
    mags = jnp.abs(alpha)
    hard = (alpha < 0).astype(jnp.int8)
    pm = pm - _tree_sum(jnp.logaddexp(jnp.zeros_like(mags), -mags), axis=1)
    K = min(Lsz - 1, S_node)
    if K == 0:  # L = 1: plain hard decision, no branching
        return hard, pm, None
    pos = lax.broadcasted_iota(jnp.int32, mags.shape, 1)
    smags, sidx = lax.sort((mags, pos), dimension=1, is_stable=True,
                           num_keys=1)
    magsK = smags[:, :K, :]                      # [L, K, B]
    idxK = sidx[:, :K, :].astype(dtype)          # exact small ints in float
    fdec = jnp.zeros((Lsz, K, batch), dtype)
    R_tot = None
    for s in range(K):
        cand = jnp.concatenate([pm, pm - magsK[:, s, :]], axis=0)
        pm, flip, R = _prune_2l(cand, Lsz, leaf_impl)
        magsK = _apply_perm(R, magsK)
        idxK = _apply_perm(R, idxK)
        fdec = _apply_perm(R, fdec)
        fdec = fdec.at[:, s, :].set(flip)
        R_tot = R if R_tot is None else _compose(R, R_tot)
    hard = _apply_perm_bits(R_tot, hard)
    posS = lax.broadcasted_iota(jnp.int32, (Lsz, K, S_node, batch), 2)
    idx_i = jnp.round(idxK).astype(jnp.int32)
    flips = jnp.sum((posS == idx_i[:, :, None, :]).astype(dtype)
                    * fdec[:, :, None, :], axis=1)
    beta = hard ^ jnp.round(flips).astype(jnp.int8)
    return beta, pm, R_tot


def _rep_fast(alpha, pm, Lsz, leaf_impl: str = "onehot"):
    """Fast repetition node (all positions frozen except the last leaf in
    decode order): the node codeword is a single repeated bit, so the 2^1
    candidates are scored whole — ONE stable top-L prune instead of S leaf
    selections.  Candidate metrics ``pm + Σ_i log P(b | a_i)`` with the
    deterministic tree-sum order (NumPy-twin bit-exact).  Approximate vs
    the exact leaf-by-leaf recursion (which scores frozen leaves on
    min-sum-combined inner LLRs); opt-in via ``node_mode="fast"``."""
    d0, d1 = _d0_d1(alpha)
    cand = jnp.concatenate([pm + _tree_sum(d0, axis=1),
                            pm + _tree_sum(d1, axis=1)], axis=0)
    pm, bit, R = _prune_2l(cand, Lsz, leaf_impl)
    beta = jnp.broadcast_to(bit.astype(jnp.int8)[:, None, :], alpha.shape)
    return beta, pm, R


def _identity_r(Lsz, batch, dtype):
    """Identity list permutation ``[L, L, B]``."""
    return jnp.broadcast_to(jnp.eye(Lsz, dtype=dtype)[..., None],
                            (Lsz, Lsz, batch))


def _broadcast_rows(x, L):
    """``[1, M, B] → [L, M, B]`` (no-op when already L rows).  The kernel
    algebra overrides this with an explicit concat — Mosaic rejects
    leading-dim replicated broadcasts on 3D vectors."""
    if x.shape[0] == L:
        return x
    return jnp.broadcast_to(x, (L,) + x.shape[1:])


#: default (XLA) one-hot list algebra — broadcast forms, fused by XLA
_BROADCAST_ALGEBRA = {
    "perm": "onehot",
    "apply_perm": _apply_perm,
    "apply_perm_bits": _apply_perm_bits,
    "compose": _compose,
    "info_leaf": _info_leaf,
    "identity_r": _identity_r,
    "broadcast_rows": _broadcast_rows,
    "rate1_fast": _rate1_fast,
    "rep_fast": _rep_fast,
}


# ---------------------------------------------------------------------------
# rank-vector list algebra (``perm_impl="rank"``)
#
# Permutations/selections are int32 rank vectors ``r [L_out, B]``:
# out[l, b] reads in[r[l, b], b] — the same semantics as the one-hot
# tensors above with L× less state (pendings [L, B] instead of [L, L, B])
# and L× cheaper composition (the VERDICT r2 top item: the O(L²·B) compose
# chains were ~40% of the flagship body's algebra, and the pend operands
# were the dominant superkernel VMEM term at L = 32).  Applications
# materialize the selection masks on the fly and SELECT — no arithmetic on
# the operand, so they are exact for any values (±inf included) and any
# dtype.  Outputs are bit-identical to the one-hot algebra by construction
# (both are pure selections with identical candidate ordering).
# ---------------------------------------------------------------------------

def _apply_perm_rank(r, x):
    """Rank vector ``r [L, B]`` applied to ``x [J, M, B]`` → ``[L, M, B]``:
    ``out[l] = x[r[l]]``.  Broadcast select-sum (XLA fuses); exact for any
    operand dtype/values — pure selection, no arithmetic on ``x``."""
    J = x.shape[0]
    sel = (r[:, None, :]
           == lax.broadcasted_iota(jnp.int32, (r.shape[0], J, r.shape[1]), 1))
    return jnp.sum(jnp.where(sel[:, :, None, :], x[None], 0), axis=1,
                   dtype=x.dtype)


def _compose_rank(a, b):
    """Composition (apply ``b`` first, then ``a``): ``c[l] = b[a[l]]``.

    Packed-bitfield form (see ``scl_body_pallas._compose_rank_loop``):
    rank entries < L pack bit-fields of one int32 lane word, so the
    composition is one per-lane variable shift + mask — O(L) ops instead
    of the select-sum's O(L²).  Exact (pure integer).  Lists too wide to
    pack fall back to the select-sum."""
    J = b.shape[0]
    bits = max((J - 1).bit_length(), 1)
    if bits * J <= 31:
        packed = b[:1]
        for j in range(1, J):
            packed = packed | (b[j:j + 1] << (bits * j))
        return jnp.right_shift(packed, a * bits) & ((1 << bits) - 1)
    sel = (a[:, None, :]
           == lax.broadcasted_iota(jnp.int32, (a.shape[0], J, a.shape[1]), 1))
    return jnp.sum(jnp.where(sel, b[None], 0), axis=1, dtype=jnp.int32)


def _info_leaf_rank(a, pm, Lsz, leaf_impl: str = "onehot"):
    """``_info_leaf`` with the permutation returned as a rank vector
    ``[lv', B] int32`` instead of a one-hot ``[lv', lv, B]``.  Identical
    candidate ordering/tie semantics (width-generic, see ``_info_leaf``);
    the sort path reads the rank vector straight off the stable sort's
    index payload."""
    lv = pm.shape[0]
    out = min(2 * lv, Lsz)
    d0, d1 = _d0_d1(a)
    cand = jnp.concatenate([pm + d0, pm + d1], axis=0)  # [2·lv, B]
    if leaf_impl == "sort":
        idx = lax.broadcasted_iota(jnp.int32, cand.shape, 0)
        sorted_neg, sorted_idx = lax.sort(
            (-cand, idx), dimension=0, is_stable=True, num_keys=1)
        top_idx = sorted_idx[:out]
        pm2 = -sorted_neg[:out]
        bits = (top_idx >= lv).astype(jnp.int8)
        return bits[:, None, :], pm2, top_idx % lv
    rank = _cand_ranks(cand)
    two_l = cand.shape[0]
    sshape = (out, two_l, cand.shape[1])
    sel = (jnp.broadcast_to(rank[None, :, :], sshape)
           == lax.broadcasted_iota(jnp.int32, sshape, 0))
    pm2 = jnp.sum(jnp.where(sel, cand[None], 0), axis=1)
    bits = jnp.sum(sel[:, lv:, :], axis=1).astype(jnp.int8)
    j_iota = lax.broadcasted_iota(jnp.int32, sshape, 1)
    src = jnp.sum(jnp.where(sel, jnp.where(j_iota < lv, j_iota,
                                           j_iota - lv), 0),
                  axis=1, dtype=jnp.int32)
    return bits[:, None, :], pm2, src


def _identity_r_rank(Lsz, batch, dtype):
    """Identity rank vector ``[L, B] int32`` (``dtype`` unused — rank
    vectors are always int32)."""
    del dtype
    return lax.broadcasted_iota(jnp.int32, (Lsz, batch), 0)


def _onehot_to_rank(R):
    """One-hot selection ``[L, J, B]`` → rank vector ``[L, B] int32``
    (exact: the weighted sum has a single nonzero term with a small-int
    weight representable in the float dtype)."""
    J = R.shape[1]
    j_iota = lax.broadcasted_iota(jnp.int32, R.shape, 1)
    return jnp.sum(jnp.where(R != 0, j_iota, 0), axis=1, dtype=jnp.int32)


def _rate1_fast_rank(alpha, pm, Lsz, leaf_impl: str = "onehot"):
    """``_rate1_fast`` for the rank algebra (XLA side): identical
    computation, permutation converted to a rank vector at the boundary."""
    beta, pm, R = _rate1_fast(alpha, pm, Lsz, leaf_impl)
    return beta, pm, None if R is None else _onehot_to_rank(R)


def _rep_fast_rank(alpha, pm, Lsz, leaf_impl: str = "onehot"):
    """``_rep_fast`` for the rank algebra (XLA side)."""
    beta, pm, R = _rep_fast(alpha, pm, Lsz, leaf_impl)
    return beta, pm, _onehot_to_rank(R)


def _apply_perm_rank_matmul(r, x):
    """Rank apply as a ONE-HOT MATMUL riding the MXU:
    ``out[l,m,b] = Σ_j P[l,j,b]·x[j,m,b]`` with ``P = onehot(r)`` as a
    batched ``dot_general`` (batch axis = lanes).  The select-sum form is
    O(L·J) VPU element-ops per plane element — dominant at L = 32 — while
    the MXU contracts the list axis at matmul rates.

    Exactness (tests + hardware bit-match enforce): P has exact 0/1
    entries and every payload routed through ``apply_perm`` is FINITE
    (alpha planes, beta bits, fast-node magnitude/index planes; path
    metrics with −inf phantoms go through the leaf rankings, never this)
    — so each output is a sum of exact zeros plus the bf16x3/x6 split
    pieces of ONE f32, which reassemble to that f32 exactly in any
    association order (the split pieces are constructed so every partial
    sum is representable).  ``Precision.HIGHEST`` pins the ≥3-pass
    decomposition."""
    if x.shape[1] < int(_os.environ.get("FEC_RANK_MATMUL_MIN_M", "0")):
        return _apply_perm_rank(r, x)  # narrow planes: transposes dominate
    J = x.shape[0]
    # non-float payloads ride an f32 cast: exact only below 2^24.  Every
    # integer plane this path can see is int8/int16 (beta bit planes take
    # the packed-shift form; rank vectors never ride apply_perm) — reject
    # wider integer dtypes statically rather than corrupt silently.
    assert (jnp.issubdtype(x.dtype, jnp.floating)
            or jnp.dtype(x.dtype).itemsize <= 2), (
        f"matmul rank apply: integer payload {x.dtype} may exceed 2^24 "
        f"and would corrupt through the f32 cast — use the select-sum form")
    xf = (x if jnp.issubdtype(x.dtype, jnp.floating)
          else x.astype(jnp.float32))
    P = (r[:, None, :] == lax.broadcasted_iota(
        jnp.int32, (r.shape[0], J, r.shape[1]), 1)).astype(xf.dtype)
    out = jnp.einsum("ljb,jmb->lmb", P, xf,
                     precision=lax.Precision.HIGHEST)
    return out.astype(x.dtype)


def _apply_perm_rank_bits_packed(r, x):
    """Rank apply on 0/1 bit planes ``x [J, M, B] int8`` (XLA form): pack
    the J bit-planes into one int32 word per (m, b); each output row is a
    per-lane variable shift + mask — O(J + L) ops instead of the
    select-sum's O(L·J).  Exact (beta planes are strictly 0/1); J > 32
    falls back to the select-sum."""
    J = x.shape[0]
    if J > 32:
        return _apply_perm_rank(r, x)
    xi = x.astype(jnp.int32)
    packed = xi[0]                                               # [M, B]
    for j in range(1, J):  # in-graph shifts: j=31 wraps the sign bit fine
        packed = packed | (xi[j] << j)
    # arithmetic >> is safe under the & 1: sign-extension only enters
    # from the top, the low bit after a k<32 shift is unaffected
    out = jnp.right_shift(packed[None], r[:, None, :]) & 1
    return out.astype(x.dtype)


def _compose_rank_matmul(a, b):
    """Rank composition ``c[l] = b[a[l]]`` as a one-hot matmul (MXU).
    Payload values are list indices 0..L−1 — exactly representable in
    bf16 (≤ 256), so the product/accumulate path is exact."""
    J = b.shape[0]
    P = (a[:, None, :] == lax.broadcasted_iota(
        jnp.int32, (a.shape[0], J, a.shape[1]), 1)).astype(jnp.float32)
    out = jnp.einsum("ljb,jb->lb", P, b.astype(jnp.float32),
                     precision=lax.Precision.HIGHEST)
    return out.astype(jnp.int32)


def _apply_perm_rank_gather(r, x):
    """Rank apply ``out[l] = x[r[l]]`` as an XLA gather (``take_along_axis``
    over the list axis; Mosaic kernels keep the select chains).  The
    select-sum form is O(L·J) work per element — fine at L = 8, dominant
    at L = 32.  NOTE rank vectors are SELECTIONS, not permutations: after
    a prune several survivors may share a source path (duplicated rows),
    so sort/scatter formulations are invalid — a gather is required.
    Exact for any payload dtype/values (pure selection)."""
    idx = jnp.broadcast_to(r[:, None, :], (r.shape[0],) + x.shape[1:])
    return jnp.take_along_axis(x, idx, axis=0)


#: rank-vector list algebra — XLA broadcast forms
_RANK_ALGEBRA = {
    "perm": "rank",
    "apply_perm": _apply_perm_rank,
    "apply_perm_bits": _apply_perm_rank_bits_packed,
    "compose": _compose_rank,
    "info_leaf": _info_leaf_rank,
    "identity_r": _identity_r_rank,
    "broadcast_rows": _broadcast_rows,
    "rate1_fast": _rate1_fast_rank,
    "rep_fast": _rep_fast_rank,
}


def rank_algebra_for(Lsz: int):
    """XLA rank algebra for the list size.  The ``take_along_axis`` gather
    apply was measured and REJECTED as a default (v5e, 2026-08-20): XLA
    lowers the per-lane-index gather to scalar code — N=4096 SCL-32 real
    mask 29.06 s vs 0.156 s per 1024-frame batch (186× slower than the
    select-sum form).  It remains reachable via ``FEC_RANK_GATHER_MIN_L``
    for future-backend A/Bs; both forms are bit-identical selections."""
    if Lsz >= int(_os.environ.get("FEC_RANK_GATHER_MIN_L", "1000000")):
        alg = dict(_RANK_ALGEBRA)
        alg["apply_perm"] = _apply_perm_rank_gather
        alg["apply_perm_bits"] = _apply_perm_rank_gather
        return alg
    if Lsz >= int(_os.environ.get("FEC_RANK_MATMUL_MIN_L", "1000000")):
        # bit-plane applies keep the packed-shift form (beats the MXU
        # round-trip); only float-plane applies and composes ride matmuls
        alg = dict(_RANK_ALGEBRA)
        alg["apply_perm"] = _apply_perm_rank_matmul
        alg["compose"] = _compose_rank_matmul
        return alg
    return _RANK_ALGEBRA


def _ctz(x: int) -> int:
    return (x & -x).bit_length() - 1


def _make_chunk_body(flags: np.ndarray, Lsz: int, dtype,
                     leaf_impl: str = "onehot", algebra=None,
                     node_mode: str = "exact"):
    """Specialized size-S subtree decoder for one *static* frozen pattern.

    ``body(alpha [L,S,B], pm [L,B]) → (beta [L,S,B] int8, pm, R [L,L,B])``;
    ``R`` maps post-chunk list slots to pre-chunk slots
    (``after[l] = before[R[l]]``).  Static specialization keeps the
    unrolled decoder's structural shortcuts: rate-0 subtrees collapse to a
    pure metric recursion and permutation re-indexing is skipped wherever
    no prune can occur (``R = None``) — ``fastscl.node`` on contiguous
    halves, batch-last.

    ``algebra`` optionally overrides the one-hot list-algebra primitives
    (``apply_perm``, ``apply_perm_bits``, ``compose``, ``info_leaf``,
    ``identity_r``) — used by ``ops/scl_body_pallas.py`` to substitute
    Mosaic-friendly static-loop forms (the broadcast forms here trip a
    Mosaic replicated-relayout bug on 3D vectors); results are bit-exact
    either way because one-hot sums have a single nonzero term.
    """
    flags = np.asarray(flags, bool)
    S = len(flags)
    assert node_mode in ("exact", "fast"), node_mode
    if algebra is None:
        algebra = _BROADCAST_ALGEBRA
    if node_mode == "fast":
        # fast nodes come from the algebra: XLA forms here, the
        # Mosaic-safe iterative forms in ops/scl_body_pallas.py (the
        # one-hot LOOP algebra has none — kernel fast is rank-only)
        assert "rate1_fast" in algebra, \
            "node_mode='fast' needs an algebra with fast list nodes"
    apply_perm = algebra["apply_perm"]
    apply_perm_bits = algebra["apply_perm_bits"]
    compose = algebra["compose"]
    info_leaf = algebra["info_leaf"]
    identity_r = algebra["identity_r"]
    roll_rows = algebra.get("roll_rows")

    def node(alpha, pm, off: int, size: int):
        sub = flags[off:off + size]
        if sub.all():  # rate-0: metrics only, no prune (level-parallel)
            return (jnp.zeros(alpha.shape, jnp.int8),
                    pm + _rate0_metric_levelpar(alpha, roll_rows), None)
        if size == 1:
            return info_leaf(alpha[:, 0, :], pm, Lsz, leaf_impl)
        if node_mode == "fast":
            if not sub.any():        # rate-1: all-info subtree
                return algebra["rate1_fast"](alpha, pm, Lsz, leaf_impl)
            if sub[:-1].all() and not sub[-1]:   # repetition subtree
                return algebra["rep_fast"](alpha, pm, Lsz, leaf_impl)
        elif sub[:-1].all() and not sub[-1] and size <= _LEVELPAR_MAX:
            # EXACT repetition node: bit-identical to the leaf-by-leaf
            # recursion, computed level-parallel (see _rep_exact).  Wider
            # REPs split through the generic recursion first (left rate-0
            # + right REP — the identical DAG), bounding kernel VMEM
            return _rep_exact(alpha, pm, Lsz, info_leaf, leaf_impl,
                              roll_rows)
        half = size // 2
        first, second = alpha[:, :half, :], alpha[:, half:, :]
        beta_l, pm, R_l = node(f_minsum(first, second), pm, off, half)
        if R_l is not None:
            alpha = apply_perm(R_l, alpha)
            first, second = alpha[:, :half, :], alpha[:, half:, :]
        sgn = 1.0 - 2.0 * beta_l.astype(alpha.dtype)
        beta_r, pm, R_r = node(second + sgn * first, pm, off + half, half)
        if R_r is not None:
            beta_l = apply_perm_bits(R_r, beta_l)
        beta = jnp.concatenate([beta_l ^ beta_r, beta_r], axis=1)
        if R_l is None:
            R = R_r
        elif R_r is None:
            R = R_l
        else:
            R = compose(R_r, R_l)
        return beta, pm, R

    def body(alpha, pm):
        # width-generic: alpha/pm may carry lv < Lsz live rows (live-width
        # decoding); R widths follow the leaf growth, identity at the
        # INPUT width when no leaf produced one
        beta, pm, R = node(alpha, pm, 0, S)
        if R is None:
            R = identity_r(alpha.shape[0], alpha.shape[-1], dtype)
        return beta, pm, R

    return body


def decode_selector(sel: int, t: int) -> tuple[int, bool]:
    """Descend-selector encoding shared by the schedule and the kernels:
    0..t are plain variants (k = sel), t+1+k are invariant-parent
    variants.  Returns ``(k, invariant_parent)``."""
    if sel <= t:
        return sel, False
    return sel - t - 1, True


def pend_liveness(desc_k, asc_j, t: int, C: int):
    """Static per-chunk compose masks: which pending permutations actually
    need this chunk's relative permutation R composed in.

    A compose into ``pend_x[l]`` at chunk c is *dead* unless the next
    schedule event touching that pending (in program order: descend reads /
    descend resets at the next chunks, this chunk's ascend reads, ascend
    reset) is a READ — a reset overwrites the accumulated value unread.
    ~60% of all composes are dead at flagship and large-code schedules
    (measured 38-42% needed), and skipping them also shrinks the
    superkernels' pend operand footprint (the dominant VMEM term at
    L = 32).  Bit-exactness is structural: a skipped compose is provably
    never read before its next reset (cross-control-mode equality tests
    enforce).

    Returns ``(compose_a, compose_b)``: tuples (len C−1) of frozensets of
    level indices for the in-scan chunks 0..C−2.  The last chunk never
    composes into storage (``_make_last_fn`` folds R into its reads).
    """
    events: list[tuple[tuple[int, int], str, tuple[str, int]]] = []
    for c in range(C):
        k, inv = decode_selector(int(desc_k[c]), t)
        if c == 0:
            lo = 1
            for l in range(t):
                events.append(((c, 0), "reset", ("a", l)))
        else:
            lo = t - k
            if lo >= 2 and not inv:
                events.append(((c, 0), "read", ("a", lo - 2)))
            events.append(((c, 0), "read", ("b", lo - 1)))
            for l in range(lo - 1, t):
                events.append(((c, 0), "reset", ("a", l)))
        j = int(asc_j[c]) if c < C - 1 else t
        for s in range(j):
            events.append(((c, 2), "read", ("b", t - 1 - s)))
        if c < C - 1:
            events.append(((c, 2), "reset", ("b", t - j - 1)))
    compose_a: list[frozenset] = []
    compose_b: list[frozenset] = []
    for c in range(C - 1):
        ca, cb = set(), set()
        for kind, lvl, out in (("a", None, ca), ("b", None, cb)):
            for l in range(t):
                nxt = None
                for (tm, ty, p) in events:
                    if p == (kind, l) and tm > (c, 1):
                        nxt = ty
                        break
                if nxt == "read":
                    out.add(l)
        compose_a.append(frozenset(ca))
        compose_b.append(frozenset(cb))
    return tuple(compose_a), tuple(compose_b)


def super_touch_sets(sel: int, j: int, t: int,
                     compose_a=None, compose_b=None):
    """Static I/O footprint of one super-step variant (list indices into
    the level stacks, level l ↔ index l−1).  Drives the selective-operand
    Pallas superkernel (``ops/scl_superchunk_pallas.py``) — per-variant
    VMEM stays small because only the touched levels ride through the
    kernel.

    ``compose_a`` / ``compose_b`` are the chunk's live-compose masks
    (``pend_liveness``); ``None`` means compose everything (legacy).
    Pending I/O: inputs are the descend-read level plus composed levels
    whose pre-value survives (a pend_a level reset in this chunk's descend
    composes from the in-kernel identity, needing no input); outputs are
    the composed levels minus the ascend-reset level (whose final value is
    a constant identity the JAX wrapper writes directly).  Reset-only
    pends never enter the kernel at all.
    """
    k, _ = decode_selector(sel, t)
    if k == t:
        needs_llr = True
        alpha_read: list[int] = []
        alpha_write = list(range(t))
        beta_read_desc: list[int] = []
        pend_a_read_desc: list[int] = []
        a_resets = set(range(t))
    else:
        lo = t - k
        needs_llr = lo == 1
        alpha_read = [] if lo == 1 else [lo - 2]
        alpha_write = list(range(lo - 1, t))
        beta_read_desc = [lo - 1]
        _, inv = decode_selector(sel, t)
        pend_a_read_desc = [lo - 2] if (lo >= 2 and not inv) else []
        a_resets = set(range(lo - 1, t))
    beta_read = sorted(set(beta_read_desc)
                       | {t - 1 - s for s in range(j)})
    beta_write = [t - j - 1]
    ca = set(range(t)) if compose_a is None else set(compose_a)
    cb = set(range(t)) if compose_b is None else set(compose_b)
    b_reset = t - j - 1
    pend_a_in = sorted(set(pend_a_read_desc) | (ca - a_resets))
    pend_a_out = sorted(ca)
    pend_a_eye = sorted(a_resets - ca)  # identity written by the wrapper
    # every beta read (descend g AND ascend combines) also reads its
    # pend_b — NOT implied by the compose mask: an all-frozen chunk
    # composes nothing (identity R) yet still applies pendings from
    # earlier chunks on its ascend path
    pend_b_in = sorted(set(beta_read) | cb)
    pend_b_out = sorted(cb - {b_reset})
    pend_b_eye = [b_reset]
    return dict(needs_llr=needs_llr, alpha_read=alpha_read,
                alpha_write=alpha_write, beta_read=beta_read,
                beta_write=beta_write,
                pend_a_in=pend_a_in, pend_a_out=pend_a_out,
                pend_a_eye=pend_a_eye, pend_b_in=pend_b_in,
                pend_b_out=pend_b_out, pend_b_eye=pend_b_eye)


def _make_super_fn(sel: int, j: int, t: int, sizes, Lsz: int, dtype,
                   body_fn, algebra=None, compose_a=None, compose_b=None,
                   lv_in: int = None, lv_out: int = None):
    """One whole chunk step — descend(sel) → body → pending composes →
    ascend(j) — as a pure function of explicit operands:

    ``fn(llr_nb [N, B], alpha tuple, pend_a tuple, beta tuple,
    pend_b tuple, pm [L, B]) → (alpha', pend_a', beta', pend_b', pm')``

    This is the single source of truth for the fused control path: the
    XLA form runs it with the broadcast algebra; the Pallas superkernel
    (``ops/scl_superchunk_pallas.py``) traces the identical program
    against VMEM refs with the static-loop algebra — outputs are
    bit-exact either way (one-hot sums have a single nonzero term).
    Untouched levels (see ``super_touch_sets``) pass through unread, so
    callers may stub them with ``None``.

    ``compose_a`` / ``compose_b`` (``pend_liveness``): compose the chunk's
    R only into the listed pending levels; ``None`` composes everything.
    Skipped levels pass through stale — provably unread before their next
    reset, so decode outputs are bit-identical (tests enforce across
    control modes).

    ``lv_in`` / ``lv_out`` (live-width decoding, round 5): the static
    LIVE path counts entering/leaving this chunk.  When ``lv_in < Lsz``
    the whole step runs at the live width — state planes written narrow,
    pending resets at the live width, no phantom rows computed at all.
    Exactness: finite-LLR candidates always outrank the legacy −inf
    phantoms, which deterministically take bit 0 and can never re-enter
    the live set, so the narrow program IS the reference program with
    the dead rows deleted (slot order included).  ``None`` = legacy full
    width.
    """
    if algebra is None:
        algebra = _BROADCAST_ALGEBRA
    if lv_in is None:
        lv_in = Lsz
    if lv_out is None:
        lv_out = Lsz
    live = lv_in < Lsz or lv_out < Lsz
    apply_perm = algebra["apply_perm"]
    apply_perm_bits = algebra["apply_perm_bits"]
    compose = algebra["compose"]
    identity_r = algebra["identity_r"]
    broadcast_rows = algebra["broadcast_rows"]
    k, invariant_parent = decode_selector(sel, t)

    def fn(llr_nb, alpha, pend_a, beta, pend_b, pm):
        batch = pm.shape[-1]
        eye_in = identity_r(lv_in, batch, dtype)
        eye_out = (eye_in if lv_out == lv_in
                   else identity_r(lv_out, batch, dtype))
        alpha = list(alpha)
        pend_a = list(pend_a)
        pend_b = list(pend_b)
        beta = list(beta)
        # ---- descend: g at level t−k (all-f from the root when k = t),
        # then a current-order f chain down to level t ---------------------
        if k == t:  # chunk 0: f all the way from the channel LLRs
            parent = llr_nb[None]  # [1, N, B] — path-invariant
            lo = 1
        else:
            lo = t - k
            M = sizes[lo]
            if lo == 1:
                parent = llr_nb[None]
            elif invariant_parent:
                parent = alpha[lo - 2][:1]
            else:
                parent = apply_perm(pend_a[lo - 2], alpha[lo - 2])
            # apply on the int8 plane, cast after: the selection commutes
            # with the 0/1 cast exactly, and int8 selects move 4x fewer
            # bytes through the kernel's vector units than f32 ones
            left = apply_perm_bits(pend_b[lo - 1], beta[lo - 1]).astype(dtype)
            first = broadcast_rows(parent[:, :M, :], lv_in)
            second = broadcast_rows(parent[:, M:, :], lv_in)
            parent = second + (1.0 - 2.0 * left) * first  # g
            alpha[lo - 1] = parent
            pend_a[lo - 1] = eye_in
            lo += 1
        for l in range(lo, t + 1):
            M = sizes[l]
            parent = f_minsum(parent[:, :M, :], parent[:, M:, :])
            # live mode stores path-invariant f-chain planes UN-broadcast
            # ([1, M, B]); readers' pend entries are provably < the
            # written width (ancestor rows at write time)
            alpha[l - 1] = (parent if live
                            else broadcast_rows(parent, Lsz))
            pend_a[l - 1] = eye_in
        # ---- chunk body (statically specialized subtree decode) ----------
        beta_c, pm, R = body_fn(alpha[t - 1], pm)
        # ---- compose the chunk's relative permutation into the LIVE
        # pendings (skipped ones are provably unread before their reset) --
        ca = range(t) if compose_a is None else compose_a
        cb = range(t) if compose_b is None else compose_b
        pend_a = [compose(R, p) if i in ca else p
                  for i, p in enumerate(pend_a)]
        pend_b = [compose(R, p) if i in cb else p
                  for i, p in enumerate(pend_b)]
        # ---- ascend: combine completed right subtrees, park left ---------
        cur = beta_c
        for step_i in range(j):
            i = t - step_i - 1
            left_bits = apply_perm_bits(pend_b[i], beta[i])
            cur = jnp.concatenate([left_bits ^ cur, cur], axis=1)
        stop = t - j - 1
        beta[stop] = cur
        pend_b[stop] = eye_out
        return (tuple(alpha), tuple(pend_a), tuple(beta), tuple(pend_b), pm)

    return fn


def _transform_lnb(beta, roll_rows=None):
    """Final butterfly ``u = β·G`` per path on ``[L, N, B]`` int8 planes in
    bit-reversed storage (the transform commutes with simultaneous
    row+column bit-reversal — see ``ops/sc_mega_pallas._polar_transform_nb``;
    callers un-permute rows once at the JAX level).

    The L path planes pack into bit-fields of ONE int32 ``[N, B]`` plane
    first (the butterfly is independent per path and pure XOR, which
    commutes with packing bitwise), so every stage moves L× less data.
    Small stages (m ≤ 8) pair partners with one int32 sublane roll + a
    static parity select — int8 rolls silently abort the TPU compiler
    (measured r4), int32 rolls are hardware-validated.  Bit-exact by
    construction (integer ops only)."""
    L, N, B = beta.shape
    if L > 32:  # packing needs one int32 bit-field per path
        x = beta.reshape(L * N, B)
        R = L * N
        s = 1
        while s < N:
            m = 2 * s
            x3 = x.reshape(R // m, m, B)
            up = x3[:, :s] ^ x3[:, s:]
            x = jnp.concatenate([up, x3[:, s:]], axis=1).reshape(R, B)
            s *= 2
        return x.reshape(L, N, B)
    x = beta[0].astype(jnp.int32)
    for l in range(1, L):
        x = x | (beta[l].astype(jnp.int32) << l)
    iota = None
    s = 1
    while s < N:
        m = 2 * s
        if roll_rows is not None and m <= 8 and N >= 8:
            if iota is None:
                iota = lax.broadcasted_iota(jnp.int32, (N, B), 0)
            upper = (iota & (m - 1)) < s
            x = jnp.where(upper, x ^ roll_rows(x, -s), x)
        else:
            x3 = x.reshape(N // m, m, B)
            up = x3[:, :s] ^ x3[:, s:]
            x = jnp.concatenate([up, x3[:, s:]], axis=1).reshape(N, B)
        s *= 2
    # unpack: arithmetic >> is safe under the & 1 (static shifts)
    rows = [(jnp.right_shift(x, l) & 1) for l in range(L)]
    return jnp.stack(rows, axis=0).astype(jnp.int8)


def _make_last_fn(t: int, sizes, Lsz: int, dtype, body_fn, algebra=None,
                  transform: bool = False, lv_in: int = None):
    """The LAST chunk (c = C−1 = 0b11…1) as a pure function: descend is a
    single g at level t (ctz(C−1) = 0), then ascend through every level to
    the root — no parking, the chunk's R composes into each level's
    pending on the way up.

    ``fn(llr_nb, alpha, pend_a, beta, pend_b, pm) → (root_beta [L, N, B]
    int8 bit-reversed storage, pm)``.  Same algebra-parameterization deal
    as ``_make_super_fn`` (XLA broadcast forms vs in-kernel static loops,
    bit-exact either way).

    ``transform=True`` additionally runs the final butterfly ``u = β·G``
    (``_transform_lnb``) so the returned plane is the decoded u in
    bit-reversed storage — the kernel controls fuse it here (VMEM XORs)
    instead of paying the [B, L, N] XLA butterfly's HBM round-trips."""
    if algebra is None:
        algebra = _BROADCAST_ALGEBRA
    if lv_in is None:
        lv_in = Lsz
    apply_perm = algebra["apply_perm"]
    apply_perm_bits = algebra["apply_perm_bits"]
    compose = algebra["compose"]
    broadcast_rows = algebra["broadcast_rows"]
    roll_rows = algebra.get("roll_rows")

    def fn(llr_nb, alpha, pend_a, beta, pend_b, pm):
        M = sizes[t]
        parent = (llr_nb[None] if t == 1
                  else apply_perm(pend_a[t - 2], alpha[t - 2]))
        left = apply_perm_bits(pend_b[t - 1], beta[t - 1]).astype(dtype)
        first = broadcast_rows(parent[:, :M, :], lv_in)
        second = broadcast_rows(parent[:, M:, :], lv_in)
        alpha_t = second + (1.0 - 2.0 * left) * first  # g
        beta_c, pm, R = body_fn(alpha_t, pm)
        cur = beta_c
        for l in range(t, 0, -1):
            left_bits = apply_perm_bits(compose(R, pend_b[l - 1]),
                                        beta[l - 1])
            cur = jnp.concatenate([left_bits ^ cur, cur], axis=1)
        if transform:
            cur = _transform_lnb(cur, roll_rows)
        return cur, pm

    return fn


def make_scl_decoder_scan(N: int, frozen_mask: np.ndarray, list_size: int,
                          chunk: int = 128, dtype=jnp.float32,
                          leaf_impl: str = "onehot",
                          body_impl: str = "xla",
                          control_impl: str = "split",
                          batch_tile: int = 128,
                          node_mode: str = "exact",
                          perm_impl: str = "rank",
                          mask_dedup: str = "exact",
                          live_width="auto"):
    """Build a jittable chunk-scan SCL decoder.

    Same contract as ``scl.make_scl_decoder``: ``decode(llr [B, N]) →
    (u [B, L, N] int8 natural order, metrics [B, L])``.

    ``chunk`` is the subtree size S cut by the scan (power of two ≤ N);
    compile cost is O(unique patterns · S + log(N/S)), independent of batch.

    ``control_impl`` (bit-identical outputs in every mode):

    * ``"split"`` — each chunk's descend / body / ascend phases dispatch
      as three ``lax.switch`` ops (the safe default);
    * ``"fused"`` — ONE switch per chunk over the unique (descend,
      pattern, ascend) triples;
    * ``"kernel"`` — like fused, but each triple's whole chunk step runs
      as ONE Pallas kernel with selective operands
      (``ops/scl_superchunk_pallas.py``); ``"kernel-interpret"`` is its
      CPU-testable interpret-mode twin;
    * ``"unroll-fused"`` / ``"unroll-kernel"`` — no scan, no switch: a
      straight-line chunk program (compile O(chunks) instead of O(unique
      triples); the switch barriers, not their contents, were measured as
      the dominant decode floor);
    * ``"mega"`` — the ENTIRE decode as one Pallas kernel
      (``ops/scl_mega_pallas.py``): the level stacks are pure dataflow in
      VMEM, per-tile HBM I/O collapses to llr-in → root β/pm-out.
      Configs whose live state exceeds the VMEM budget degrade to
      ``"unroll-kernel"`` (hybrid per-chunk kernels); unaligned batches
      take the bit-identical straight-line XLA program.
      ``"mega-interpret"`` is the CPU-testable interpret-mode twin.

    ``node_mode``: ``"exact"`` (default — reference-exact leaf-by-leaf
    semantics) or ``"fast"`` — SSCL fast list nodes (rate-1 and repetition
    subtrees within a chunk decode whole: ``min(L−1, S)`` flip stages /
    one selection instead of one per leaf).  *Approximate*: error rates
    statistically match exact SCL (tests enforce) but outputs are not
    bit-identical to it; the bit-exactness oracle for this mode is
    ``parity/polar_np.scl_decode_fast_np``.  With ``perm_impl="rank"``
    fast nodes run on every path incl. the Pallas kernels
    (``ops/scl_body_pallas._rate1_fast_rank_loop``); with ``"onehot"``
    they are XLA-only (``lax.sort``/scatter forms) and the mega control
    never supports them.

    ``perm_impl`` (bit-identical outputs either way): ``"rank"`` (default)
    carries list permutations as int32 rank vectors ``[L, B]`` — L× less
    pending state and L× cheaper composition than ``"onehot"``'s
    ``[L, L, B]`` tensors (see the rank-algebra block above).

    ``live_width`` (round 5 — incremental-list / live-width decoding):
    run the early chunks at the actual LIVE path count (1 → 2 → … → L,
    doubling per info leaf) instead of the full list width: no −inf
    phantom rows are computed, stored, or permuted at all.  Bit-exact vs
    the full-width program for FINITE channel LLRs (tests enforce):
    finite candidates always outrank −inf phantoms, phantoms take bit 0
    by the reference tie rules and can never re-enter the live set, and
    every slot is live again after ``log2 L`` info leaves — so outputs
    (slot order included) are identical.  A code with fewer than
    ``log2 L`` info bits pads the output with the phantom rows' exact
    values (all-zero û, −inf metric).  ``"auto"`` (default) enables it
    for ``node_mode="exact"`` + ``perm_impl="rank"`` on the straight-line
    controls (``unroll-*``, single-chunk); narrow-width chunk steps in
    ``unroll-kernel`` run the bit-identical XLA form (full-width steps
    keep their superkernels).  NOT exact for ±inf LLR inputs (a −inf
    live candidate would tie-break against phantoms by candidate index);
    finite LLRs are guaranteed by every channel in this package.

    ``mask_dedup`` (bit-identical outputs either way): ``"exact"``
    (default) keeps per-position live-compose masks in the unroll modes
    (fewest composes at runtime); ``"union"`` unions masks across chunk
    positions sharing a (descend, pattern, ascend) triple — the scan
    modes' behavior — so unroll-kernel builds O(unique triples) kernels
    instead of O(C): the N=4096 SCL-32 compile-wall fix (63 → ~16 kernel
    builds at chunk 64).
    """
    frozen_mask = np.asarray(frozen_mask, bool)
    assert frozen_mask.shape == (N,)
    assert perm_impl in ("onehot", "rank"), perm_impl
    assert mask_dedup in ("exact", "union"), mask_dedup
    alg_x = (rank_algebra_for(list_size) if perm_impl == "rank"
             else _BROADCAST_ALGEBRA)
    S = min(chunk, N)
    assert S & (S - 1) == 0 and N % S == 0
    C = N // S
    t = int(np.log2(C))
    Lsz = list_size
    rev = np.asarray(bit_reverse_permutation(N))
    chunk_flags_np = frozen_mask[rev].reshape(C, S)
    # one specialized body per unique chunk frozen pattern (lax.switch picks
    # at runtime); chunk c covers u-indices ≡ rev(c) mod C, so patterns are
    # polarization-subchannel classes and dedupe heavily at large N
    pattern_ids = np.zeros(C, np.int32)
    unique: dict[bytes, int] = {}
    unique_flags: list[np.ndarray] = []
    for c in range(C):
        key = chunk_flags_np[c].tobytes()
        if key not in unique:
            unique[key] = len(unique_flags)
            unique_flags.append(chunk_flags_np[c])
        pattern_ids[c] = unique[key]
    assert node_mode in ("exact", "fast"), node_mode
    if node_mode == "fast" and list_size > 16:
        import warnings

        # measured envelope (results/tpu/polar_n4096_scl32_fast.json): the
        # rate-1 flip stages scale O(L²K²) per node vs exact's O(m·L²), so
        # fast LOSES above L ≈ 16 (6.96 vs 12.7 Mbps at N=4096 L=32) —
        # don't let a serving config ship the slow mode silently
        warnings.warn(
            f"node_mode='fast' is a small-list serving mode: its rate-1 "
            f"flip stages scale O(L²) per stage × min(L-1, S) stages, and "
            f"it measured SLOWER than node_mode='exact' at L = 32 "
            f"(6.96 vs 12.7 Mbps, N=4096 on v5e). With list_size={list_size}"
            f" > 16, use node_mode='exact'.",
            stacklevel=2)
    if node_mode == "fast":
        # kernel fast nodes exist only in the rank algebra
        # (ops/scl_body_pallas._rate1_fast_rank_loop); the one-hot forms
        # use lax.sort/scatter and stay XLA-only
        assert control_impl not in ("mega", "mega-interpret"), (
            "node_mode='fast' is not supported by the mega control")
        if perm_impl == "onehot":
            assert body_impl == "xla", \
                "node_mode='fast' with perm_impl='onehot' is XLA-only"
            assert control_impl in ("split", "fused", "unroll-fused"), (
                "node_mode='fast' with perm_impl='onehot' has no Pallas "
                "control modes — use perm_impl='rank'")
    # ---- live-width (incremental-list) schedule: static per-chunk live
    # path counts; lv doubles per info leaf, capped at L ---------------------
    n_info_chunk = (~chunk_flags_np).sum(axis=1)
    info_before = np.concatenate([[0], np.cumsum(n_info_chunk)])

    def _lv_at(n_info):
        return int(min(Lsz, 1 << min(int(n_info), 30)))

    lv_in_c = [_lv_at(info_before[c]) for c in range(C)]
    lv_out_c = [_lv_at(info_before[c + 1]) for c in range(C)]
    live_capable = (node_mode == "exact" and perm_impl == "rank"
                    and ((C == 1 and body_impl == "xla")
                         or (C > 1 and control_impl in
                             ("unroll-fused", "unroll-kernel",
                              "unroll-kernel-interpret"))))
    if live_width == "auto":
        live_on = live_capable and any(w < Lsz for w in lv_in_c)
    else:
        live_on = bool(live_width)
        if live_on:
            assert live_capable, (
                "live_width requires node_mode='exact', perm_impl='rank' "
                "and a straight-line control (unroll-*/single-chunk)")
    if not live_on:
        lv_in_c = [Lsz] * C
        lv_out_c = [Lsz] * C

    if body_impl == "pallas":
        # fused VMEM-resident subtree bodies (ops/scl_body_pallas.py);
        # bit-identical to the XLA bodies (the kernel traces the same jnp
        # program against refs) — tests enforce
        from ...ops.scl_body_pallas import make_chunk_body_pallas

        bodies = [make_chunk_body_pallas(f, Lsz, dtype, leaf_impl=leaf_impl,
                                         perm_impl=perm_impl,
                                         node_mode=node_mode,
                                         batch_tile=batch_tile)
                  for f in unique_flags]
    else:
        assert body_impl == "xla", body_impl
        bodies = [_make_chunk_body(f, Lsz, dtype, leaf_impl,
                                   algebra=(alg_x if perm_impl == "rank"
                                            else None),
                                   node_mode=node_mode)
                  for f in unique_flags]
    rev_j = jnp.asarray(rev, jnp.int32)

    def _pad_rows(x, value):
        """Live-width output pad: a code with < log2 L info leaves ends
        with lv < L live slots; the missing slots are the phantom rows'
        exact values (all-zero codeword / −inf metric — phantoms take
        bit 0 everywhere and keep −inf + finite = −inf)."""
        w = x.shape[0]
        if w == Lsz:
            return x
        pad = jnp.full((Lsz - w,) + x.shape[1:], value, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    def _finish(root_bits_lnb, pm_lb):
        """[L, N, B] bit-rev β + [L, B] metrics → public [B, L, N]/[B, L]."""
        root_bits_lnb = _pad_rows(root_bits_lnb, 0)
        pm_lb = _pad_rows(pm_lb, _NEG_INF)
        beta_nat = jnp.transpose(root_bits_lnb, (2, 0, 1))[..., rev_j]
        return polar_transform(beta_nat), jnp.transpose(pm_lb, (1, 0))

    def _finish_u(u_lnb, pm_lb):
        """Like ``_finish`` but the butterfly already ran (fused into the
        last chunk kernel): just un-permute rows + batch-first."""
        u_nat = jnp.transpose(_pad_rows(u_lnb, 0), (2, 0, 1))[..., rev_j]
        pm_lb = _pad_rows(pm_lb, _NEG_INF)
        return u_nat, jnp.transpose(pm_lb, (1, 0))

    def _init_pm(batch):
        if live_on:  # one live path, no phantoms
            return jnp.zeros((1, batch), dtype)
        pm = jnp.full((Lsz, batch), _NEG_INF, dtype)
        return pm.at[0, :].set(0.0)

    if C == 1:
        body = bodies[0]

        def decode_single(llr):
            llr = jnp.asarray(llr, dtype)
            assert llr.ndim == 2, "SCL decode expects [batch, N]"
            batch = llr.shape[0]
            llr_nb = jnp.transpose(llr[:, rev_j], (1, 0))  # [N, B]
            width = 1 if live_on else Lsz
            alpha = jnp.broadcast_to(llr_nb[None], (width, N, batch))
            beta, pm, _ = body(alpha, _init_pm(batch))
            return _finish(beta, pm)

        return decode_single

    # -- host-precomputed per-chunk schedules (levels indexed 1..t) ----------
    # upd[c, l]: recompute level-l alpha this chunk (deepest-common-ancestor
    #            rule: levels t-ctz(c)..t change between consecutive chunks)
    # dirr[c, l]: chunk path bit at level l — False → left child (f update),
    #            True → right child (g update, consumes the stored left beta)
    # asc[c, l]: combine the finished subtree's beta with the stored left
    #            beta at level l while ascending (trailing-ones rule)
    # store[c, l]: park the ascended beta as the new left beta at level l
    # The per-chunk control flow is fully determined by two trailing-zero
    # counts, so it compiles as two lax.switch dispatches over straight-line
    # variants (per-level lax.cond chains cost ~ms-scale pipeline barriers
    # per chunk on TPU — measured as the dominant fixed overhead):
    #   descend variant k = ctz(c) (k = t for c = 0): g at level t−k, then a
    #   current-order f chain down to level t (no pending refreshes needed
    #   below the g level — those alphas are written this chunk);
    #   ascend variant j = ctz(c+1): j combines (levels t .. t−j+1), then
    #   park the result as the left beta at level t−j.
    #   invariant-parent variants (selector t+1+k, k ≤ t−2): chunk c = 2^k
    #   performs the FIRST g-read of level t−k−1, whose stored alpha is
    #   still chunk-0's path-invariant broadcast — skip its pending
    #   refresh (exact no-op) and run the g from one slot.
    desc_k = np.array(
        [t if c == 0
         else (t + 1 + _ctz(c) if c == (1 << _ctz(c)) and _ctz(c) <= t - 2
               else _ctz(c))
         for c in range(C)], np.int32)
    asc_j = np.array([_ctz(c + 1) for c in range(C)], np.int32)
    sizes = [N >> l for l in range(t + 1)]  # alpha/beta width per level

    # the LAST chunk runs as straight-line code outside the scan (static
    # schedule) so the [L, N, B] root assembly never lives in the scan carry
    assert control_impl in ("split", "fused", "kernel", "kernel-interpret",
                            "unroll-fused", "unroll-kernel",
                            "unroll-kernel-interpret",
                            "mega", "mega-interpret"), control_impl
    mega_core = None
    if control_impl in ("mega", "mega-interpret"):
        from ...ops.scl_mega_pallas import (
            MEGA_VMEM_BUDGET,
            make_scl_mega_pallas,
            mega_vmem_bytes,
        )

        if (control_impl == "mega"
                and mega_vmem_bytes(t, sizes, Lsz, dtype, batch_tile)
                > MEGA_VMEM_BUDGET):
            # live state would not fit one core's VMEM: degrade to the
            # hybrid per-chunk kernels (bit-identical outputs)
            control_impl = "unroll-kernel"
        else:
            mega_core = make_scl_mega_pallas(
                chunk_flags_np, desc_k, asc_j, t, sizes, Lsz, dtype,
                leaf_impl=leaf_impl, batch_tile=batch_tile,
                interpret=control_impl == "mega-interpret")
            # unaligned batches fall back to the straight-line XLA program
            control_impl = "unroll-fused"
    if control_impl != "split":
        # one switch per chunk over the unique (descend, pattern, ascend,
        # compose-mask) variants that actually occur in the schedule —
        # the per-chunk live-compose masks (pend_liveness) skip the ~60%
        # of pending composes that are never read before their reset
        comp_a, comp_b = pend_liveness(desc_k, asc_j, t, C)
        # all-frozen chunks prune nothing: their body R is the identity,
        # so composing it anywhere is an exact no-op — empty the masks
        # (shrinks the superkernels' pend I/O too)
        comp_a = tuple(frozenset() if chunk_flags_np[c].all() else comp_a[c]
                       for c in range(C - 1))
        comp_b = tuple(frozenset() if chunk_flags_np[c].all() else comp_b[c]
                       for c in range(C - 1))
        keys = [(int(desc_k[c]), int(pattern_ids[c]), int(asc_j[c]))
                for c in range(C - 1)]
        if not control_impl.startswith("unroll") or mask_dedup == "union":
            # scan modes dispatch via lax.switch, whose compile cost is
            # O(unique branches): union the masks across positions that
            # share a (descend, pattern, ascend) triple — bit-exact
            # (composing a dead level is the legacy behavior) — so the
            # branch count stays O(unique triples) instead of ~O(C)
            # (measured 16 → 63 variants at N=4096 without the union).
            # The straight-line unroll modes trace per position anyway
            # and keep the exact per-position masks.
            union: dict[tuple, tuple[set, set]] = {}
            for c in range(C - 1):
                ca, cb = union.setdefault(keys[c], (set(), set()))
                ca |= comp_a[c]
                cb |= comp_b[c]
            comp_a = tuple(frozenset(union[keys[c]][0])
                           for c in range(C - 1))
            comp_b = tuple(frozenset(union[keys[c]][1])
                           for c in range(C - 1))
        # live-width: simulate the per-level state widths along the
        # straight-line schedule.  Narrow-written planes (width = live
        # count at write time) are read width-generically by the XLA
        # forms; the fixed-shape superkernels only run at positions whose
        # whole input footprint is full-width (ws_full below).
        w0 = 1 if live_on else Lsz  # carry init width
        wa = [w0] * t
        wb = [w0] * t
        wpa = [w0] * t
        wpb = [w0] * t
        width_sig = []
        ws_full = []
        for c in range(C - 1):
            k_c, inv_c = decode_selector(int(desc_k[c]), t)
            lvi, lvo = lv_in_c[c], lv_out_c[c]
            touch = super_touch_sets(int(desc_k[c]), int(asc_j[c]), t,
                                     comp_a[c], comp_b[c])
            sig = (tuple(wa), tuple(wb), tuple(wpa), tuple(wpb))
            # invariant-parent variants read alpha as a [:1] slab — any
            # stored width satisfies the kernel's slim operand spec
            a_req = [] if inv_c else touch["alpha_read"]
            full = (lvi == Lsz and lvo == Lsz
                    and all(wa[i] == Lsz for i in a_req)
                    and all(wb[i] == Lsz for i in touch["beta_read"])
                    and all(wpa[i] == Lsz for i in touch["pend_a_in"])
                    and all(wpb[i] == Lsz for i in touch["pend_b_in"]))
            width_sig.append(sig)
            ws_full.append(full)
            for i in touch["alpha_write"]:
                wa[i] = lvi
            for i in touch["pend_a_out"]:
                wpa[i] = lvo
            for i in touch["pend_a_eye"]:
                wpa[i] = lvi
            for i in touch["beta_write"]:
                wb[i] = lvo
            for i in touch["pend_b_out"]:
                wpb[i] = lvo
            for i in touch["pend_b_eye"]:
                wpb[i] = lvo
        last_full = (lv_in_c[C - 1] == Lsz
                     and (t < 2 or wa[t - 2] == Lsz)
                     and all(w == Lsz for w in wb)
                     and (t < 2 or wpa[t - 2] == Lsz)
                     and all(w == Lsz for w in wpb))
        # variants are additionally keyed by their static widths — early
        # narrow steps trace differently (no-op key when live is off)
        triples = [keys[c] + (comp_a[c], comp_b[c],
                              lv_in_c[c], lv_out_c[c],
                              width_sig[c] if live_on else None,
                              ws_full[c])
                   for c in range(C - 1)]
        uniq_t: dict[tuple, int] = {}
        tid = np.zeros(C - 1, np.int32)
        for c, tr in enumerate(triples):
            if tr not in uniq_t:
                uniq_t[tr] = len(uniq_t)
            tid[c] = uniq_t[tr]
        xs = {"tid": jnp.asarray(tid)}
    else:
        xs = {
            "desc_k": jnp.asarray(desc_k[:C - 1]),
            "asc_j": jnp.asarray(asc_j[:C - 1]),
            "pid": jnp.asarray(pattern_ids[:C - 1]),
        }

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        assert llr.ndim == 2, "SCL decode expects [batch, N]"
        batch = llr.shape[0]
        # bit-reversed storage, batch-last: [N, B]
        llr_nb = jnp.transpose(llr[:, rev_j], (1, 0))
        if mega_core is not None and batch % batch_tile == 0:
            cur, pm = mega_core(llr_nb)
            return _finish(cur, pm)
        # live-width mode starts the straight-line carry at width 1 (one
        # live path, no phantom rows); every level is written before its
        # first read (DFS schedule), so the init values are shape seeds
        w0 = 1 if live_on else Lsz
        eye = alg_x["identity_r"](w0, batch, dtype)
        carry = dict(
            alpha=tuple(jnp.zeros((w0, sizes[l], batch), dtype)
                        for l in range(1, t + 1)),
            pend_a=tuple(eye for _ in range(t)),
            beta=tuple(jnp.zeros((w0, sizes[l], batch), jnp.int8)
                       for l in range(1, t + 1)),
            pend_b=tuple(eye for _ in range(t)),
            pm=_init_pm(batch),
        )

        def _desc_branch(k, invariant_parent=False):
            """Descend variant: g at level t−k (all-f from the root when
            k = t, i.e. chunk 0), then a current-order f chain to level t.

            ``invariant_parent`` marks the FIRST g-read of a level (chunk
            c = 2^k): the parent alpha was written by chunk 0's
            path-invariant f-chain and never since, so all L list slots
            are identical — the pending refresh is an exact no-op
            (one-hot rows select equal values) and is skipped; the g runs
            on one slot and broadcasts."""

            def branch(alpha, pend_a, beta, pend_b):
                alpha = list(alpha)
                pend_a = list(pend_a)
                if k == t:  # chunk 0: f all the way from the channel LLRs
                    parent = llr_nb[None]  # [1, N, B] — path-invariant
                    lo = 1
                else:
                    lo = t - k
                    M = sizes[lo]
                    if lo == 1:
                        parent = llr_nb[None]
                    elif invariant_parent:
                        parent = alpha[lo - 2][:1]
                    else:
                        parent = alg_x["apply_perm"](pend_a[lo - 2],
                                                     alpha[lo - 2])
                    first, second = parent[:, :M, :], parent[:, M:, :]
                    left = alg_x["apply_perm_bits"](
                        pend_b[lo - 1], beta[lo - 1]).astype(dtype)
                    parent = second + (1.0 - 2.0 * left) * first  # g
                    alpha[lo - 1] = parent
                    pend_a[lo - 1] = eye
                    lo += 1
                for l in range(lo, t + 1):
                    M = sizes[l]
                    parent = f_minsum(parent[:, :M, :], parent[:, M:, :])
                    alpha[l - 1] = jnp.broadcast_to(parent, (Lsz, M, batch))
                    pend_a[l - 1] = eye
                return tuple(alpha), tuple(pend_a)

            return branch

        def _asc_branch(j):
            """Ascend variant: j combines (levels t..t−j+1), park at t−j."""

            def branch(beta, pend_b, cur):
                beta = list(beta)
                pend_b = list(pend_b)
                for step_i in range(j):
                    i = t - step_i - 1
                    left = alg_x["apply_perm_bits"](pend_b[i], beta[i])
                    cur = jnp.concatenate([left ^ cur, cur], axis=1)
                stop = t - j - 1
                beta[stop] = cur
                pend_b[stop] = eye
                return tuple(beta), tuple(pend_b)

            return branch

        def _desc_by_selector(sel: int):
            """Selector → descend branch (same encoding as ``desc_k``:
            0..t are plain variants, t+1+k are invariant-parent variants)."""
            if sel <= t:
                return _desc_branch(sel)
            return _desc_branch(sel - t - 1, invariant_parent=True)

        def _body_for(pid, narrow):
            """Chunk body for a variant: narrow (live-width) steps always
            take a width-generic XLA body — the Pallas body kernels are
            built at the full Lsz operand shapes."""
            if narrow and body_impl == "pallas":
                return _make_chunk_body(unique_flags[pid], Lsz, dtype,
                                        leaf_impl, algebra=alg_x,
                                        node_mode=node_mode)
            return bodies[pid]

        if control_impl != "split":
            if control_impl in ("fused", "unroll-fused"):
                def _super_branch(tr):
                    sel, pid, j, ca, cb, lvi, lvo, _ws, _full = tr
                    fn = _make_super_fn(sel, j, t, sizes, Lsz, dtype,
                                        _body_for(pid, lvi < Lsz),
                                        algebra=alg_x,
                                        compose_a=ca, compose_b=cb,
                                        lv_in=lvi, lv_out=lvo)

                    def branch(carry):
                        alpha, pend_a, beta, pend_b, pm = fn(
                            llr_nb, carry["alpha"], carry["pend_a"],
                            carry["beta"], carry["pend_b"], carry["pm"])
                        return dict(alpha=alpha, pend_a=pend_a, beta=beta,
                                    pend_b=pend_b, pm=pm)

                    return branch
            else:  # whole chunk step fused into ONE Pallas kernel
                from ...ops.scl_superchunk_pallas import (
                    VMEM_OPERAND_BUDGET,
                    make_superchunk_pallas,
                    super_vmem_bytes,
                )

                def _super_branch(tr):
                    sel, pid, j, ca, cb, lvi, lvo, ws, full_w = tr
                    # slim invariant alpha writes need straight-line
                    # dataflow (a scan carry would materialize the lazy
                    # re-broadcast every step)
                    slim = control_impl.startswith("unroll")
                    # live-width variants trace the same width-generic
                    # program with narrow operand shapes (widths dict);
                    # full-width variants keep the legacy kernel build
                    widths = None
                    if not full_w:
                        wa_s, wb_s, wpa_s, wpb_s = ws
                        widths = dict(wa=wa_s, wb=wb_s, wpa=wpa_s,
                                      wpb=wpb_s, lv_in=lvi, lv_out=lvo)
                    # hybrid control: variants whose operand footprint
                    # exceeds the VMEM budget (tall ascends at large N·L;
                    # the estimate is full-width, so narrow variants are
                    # gated conservatively) run the bit-identical
                    # fused-XLA program instead
                    if (super_vmem_bytes(sel, j, t, sizes, Lsz, dtype,
                                         batch_tile, compose_a=ca,
                                         compose_b=cb,
                                         perm_impl=perm_impl,
                                         slim_writes=slim)
                            > VMEM_OPERAND_BUDGET):
                        fn = _make_super_fn(sel, j, t, sizes, Lsz, dtype,
                                            _body_for(pid, lvi < Lsz),
                                            algebra=alg_x,
                                            compose_a=ca, compose_b=cb,
                                            lv_in=lvi, lv_out=lvo)
                    else:
                        fn = make_superchunk_pallas(
                            sel, unique_flags[pid], j, t, sizes, Lsz, dtype,
                            leaf_impl=leaf_impl, batch_tile=batch_tile,
                            interpret=control_impl.endswith("-interpret"),
                            compose_a=ca, compose_b=cb,
                            perm_impl=perm_impl, node_mode=node_mode,
                            slim_writes=slim, widths=widths)

                    def branch(carry):
                        alpha, pend_a, beta, pend_b, pm = fn(
                            llr_nb, carry["alpha"], carry["pend_a"],
                            carry["beta"], carry["pend_b"], carry["pm"])
                        return dict(alpha=alpha, pend_a=pend_a, beta=beta,
                                    pend_b=pend_b, pm=pm)

                    return branch

            super_branches = [_super_branch(tr) for tr in uniq_t]

            if control_impl.startswith("unroll"):
                # straight-line chunk program: no scan, no switch — each
                # chunk position calls its variant directly.  Compile cost
                # is O(chunks) instead of O(unique triples); at flagship
                # sizes the triples are all distinct anyway, and the
                # lax.switch barriers (not their contents) were measured
                # as the dominant floor (the all-frozen mask costs 80% of
                # the real one).  Prefer this whenever C is modest.
                chunk_step = None
            else:
                def chunk_step(carry, x):
                    return lax.switch(x["tid"], super_branches, carry), None

        else:
            desc_branches = [_desc_by_selector(sel)
                             for sel in range(t + 1 + max(t - 1, 0))]
            asc_branches = [_asc_branch(j) for j in range(t)]

            def chunk_step(carry, x):
                alpha, pend_a = lax.switch(
                    x["desc_k"], desc_branches, carry["alpha"],
                    carry["pend_a"], carry["beta"], carry["pend_b"])
                beta, pend_b = list(carry["beta"]), list(carry["pend_b"])

                # ---- chunk body: decode the size-S subtree (specialized) --
                if len(bodies) == 1:
                    beta_c, pm, R = bodies[0](alpha[t - 1], pm=carry["pm"])
                else:
                    beta_c, pm, R = lax.switch(x["pid"], bodies, alpha[t - 1],
                                               carry["pm"])

                # ---- compose the chunk's relative permutation into pendings
                pend_a = [alg_x["compose"](R, p) for p in pend_a]
                pend_b = [alg_x["compose"](R, p) for p in pend_b]

                # ---- ascend: combine completed right subtrees, park left --
                beta, pend_b = lax.switch(x["asc_j"], asc_branches,
                                          tuple(beta), tuple(pend_b), beta_c)

                return dict(alpha=alpha, pend_a=tuple(pend_a),
                            beta=beta, pend_b=pend_b, pm=pm), None

        if control_impl.startswith("unroll"):
            for c in range(C - 1):
                carry = super_branches[int(tid[c])](carry)
        else:
            carry, _ = lax.scan(chunk_step, carry, xs)

        # ---- last chunk (c = C−1 = 0b11…1): straight-line, static flags ---
        # descend is a single g at level t (ctz(C−1) = 0); ascend runs to
        # the root.  Kernel control modes fuse the whole step into one
        # Pallas kernel like the in-scan chunks.
        last_transformed = False
        lv_last = lv_in_c[C - 1]
        if control_impl in ("kernel", "kernel-interpret", "unroll-kernel",
                            "unroll-kernel-interpret"):
            from ...ops.scl_superchunk_pallas import (
                VMEM_OPERAND_BUDGET,
                last_vmem_bytes,
                make_last_superchunk_pallas,
            )

            if (not last_full
                    or last_vmem_bytes(t, sizes, Lsz, dtype, batch_tile,
                                       perm_impl=perm_impl)
                    > VMEM_OPERAND_BUDGET):  # hybrid fallback (large N·L
                # or a live-width narrow input footprint)
                last_fn = _make_last_fn(t, sizes, Lsz, dtype,
                                        _body_for(pattern_ids[C - 1],
                                                  lv_last < Lsz),
                                        algebra=alg_x, lv_in=lv_last)
            else:
                # fuse the final butterfly u = β·G into the kernel (pure
                # XORs on the VMEM-resident plane) instead of a [B, L, N]
                # XLA pass over HBM
                last_transformed = True
                last_fn = make_last_superchunk_pallas(
                    unique_flags[pattern_ids[C - 1]], t, sizes, Lsz, dtype,
                    leaf_impl=leaf_impl, batch_tile=batch_tile,
                    interpret=control_impl.endswith("-interpret"),
                    perm_impl=perm_impl, node_mode=node_mode,
                    transform=True)
        else:
            last_fn = _make_last_fn(t, sizes, Lsz, dtype,
                                    _body_for(pattern_ids[C - 1],
                                              lv_last < Lsz),
                                    algebra=alg_x, lv_in=lv_last)
        cur, pm = last_fn(llr_nb, carry["alpha"], carry["pend_a"],
                          carry["beta"], carry["pend_b"], carry["pm"])
        # root plane is in bit-reversed storage: either β (un-permute
        # rows, then u = β·G_N at the XLA level — the transform is an
        # involution) or the already-transformed u from the fused kernel
        return (_finish_u if last_transformed else _finish)(cur, pm)

    return decode
