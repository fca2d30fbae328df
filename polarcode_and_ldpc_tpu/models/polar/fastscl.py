"""Unrolled recursive SCL decoder — the TPU fast path for list decoding.

Same recursion as ``fastsc.py`` but with a path/list axis: state is
``α [B, L, M]`` per node plus path metrics ``pm [B, L]``.

Key idea — **lazy permutation composition**: pruning at an info leaf
permutes the list axis of *all* live state.  The scan-based decoder
(``scl.py``) therefore gathers the full ``[L, n+1, N]`` trellis twice per
info bit — O(K·L·N·log N) gather traffic.  Here nothing is gathered at the
prune except the metrics; each subtree *returns* the relative permutation
``R`` accumulated inside it (``state_after[l] = state_before[R[l]]``,
composed leaf-to-root as ``R = R_left[R_right]``), and every live α/β
segment is re-indexed lazily, exactly once, at the moment its parent node
consumes it.  Note ``R`` is a *selection map*, not a bijection — survivor
lists duplicate forked parents — which is why it must be composed forward
like this rather than recovered from absolute lineage records (lineage
merges on forks and cannot be inverted).  Total gather traffic drops to
O(L·N·log N) per frame.  Whether a subtree prunes at all is static (it
prunes iff it contains an info leaf), so rate-0 subtrees compose for free
and collapse into a pure metric-update recursion.

Outputs are bit-exact with ``scl.make_scl_decoder`` and the NumPy twin
(``parity/polar_np.scl_decode_np``): same stable candidate ordering
(bit-0 block then bit-1 block, ``decoder.py:299-307``), same phantom-path
(−inf) handling, same stable-sort tie-breaking.

The per-path codeword β returned at the root is the re-encoded codeword;
``u = β·G_N`` recovers the u-domain paths (G_N is an involution), so no
per-leaf bit bookkeeping or u-tensor gathers are needed at all.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .encoder import polar_transform
from .trellis import f_minsum

_NEG_INF = -jnp.inf


def _d0_d1(a):
    """(log P(0|llr), log P(1|llr)) — reference ``decoder.py:374-406``."""
    zero = jnp.zeros_like(a)
    return -jnp.logaddexp(zero, -a), -jnp.logaddexp(zero, a)


def _reindex(x, rel):
    """Gather the list axis (axis 1) of ``[B, L, ...]`` by ``rel [B, L]``."""
    idx = rel.reshape(rel.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, jnp.broadcast_to(idx, rel.shape + x.shape[2:]),
                               axis=1)


# ---------------------------------------------------------------------------
# one-hot selection algebra (the TPU-fast path)
#
# XLA lowers take_along_axis / argsort on TPU to scalar-ish gathers and
# sorts, which dominate the decode (measured ~95% of SCL wall time).  All
# of it is replaced by dense one-hot linear algebra the VPU/MXU eat:
#
# * stable descending ranks come from an all-pairs comparison matrix
#   (candidate j precedes i iff cand_j > cand_i, or equal and j < i);
# * the survivor selection is a [B, L, 2L] one-hot matrix; multiplying by
#   it *is* the gather, and is exact in f32 (each row sums exactly one
#   message, scaled by 1.0);
# * relative permutations compose by matmul of their one-hot matrices.
# ---------------------------------------------------------------------------

def _stable_topk_onehot(cand, Lsz, dtype):
    """Stable-descending top-L selection one-hot ``S [B, L, 2L]``.

    ``S[b, s, i] = 1`` iff candidate i holds survivor slot s under the
    reference's ordering (sort by metric desc, ties by candidate index —
    exactly Python's stable sort in ``decoder.py:306-307``).
    """
    two_l = cand.shape[-1]
    gt = (cand[..., :, None] < cand[..., None, :])          # [B, i, j]: cand_j > cand_i
    eq = (cand[..., :, None] == cand[..., None, :])
    jlti = jnp.tril(jnp.ones((two_l, two_l), bool), k=-1)   # j < i
    before = gt | (eq & jlti)                                # j precedes i
    rank = jnp.sum(before, axis=-1, dtype=jnp.int32)         # [B, 2L]
    slots = jnp.arange(Lsz, dtype=jnp.int32)
    return (rank[..., None, :] == slots[:, None]).astype(dtype)  # [B, L, 2L]


def _sel_apply(S, x):
    """Apply selection ``S [B, L, J]`` to ``x [B, J, M]`` along the list
    axis (einsum 'blj,bjm->blm'); exact for one-hot S and finite x."""
    xf = x.reshape(x.shape[0], x.shape[1], -1)
    out = jnp.einsum("blj,bjm->blm", S, xf.astype(S.dtype),
                     preferred_element_type=S.dtype)
    return out.reshape(x.shape[0], S.shape[1], *x.shape[2:])


def _sel_metrics(S, cand):
    """Select metrics ``[B, J] → [B, L]`` by one-hot ``S [B, L, J]``.

    Masked sum, not matmul: candidates can be −inf (phantom paths) and
    ``0 × (−inf) = NaN`` would poison a matmul."""
    return jnp.sum(jnp.where(S != 0, cand[..., None, :], 0), axis=-1)


def _sel_apply_bits(S, bits):
    """Selection applied to int8 bit-planes (values exactly 0/1)."""
    return _sel_apply(S, bits).astype(jnp.int8)


def make_scl_decoder_unrolled(N: int, frozen_mask: np.ndarray, list_size: int,
                              dtype=jnp.float32, use_onehot: bool = True):
    """Build a jittable unrolled SCL decoder.

    Returns ``decode(llr: [batch, N]) -> (u: [batch, L, N] int8,
    metrics: [batch, L])`` — same contract as ``scl.make_scl_decoder``.

    ``use_onehot`` (default) runs prune/permute as one-hot matmuls on the
    MXU/VPU instead of argsort + gathers (which lower to slow scalar code
    on TPU); outputs are bit-identical either way.
    """
    frozen_mask = np.asarray(frozen_mask, bool)
    assert frozen_mask.shape == (N,)
    Lsz = list_size

    def rate0_metric(alpha):
        """Σ log P(0 | leaf llr) over an all-frozen subtree → [B, L]."""
        if alpha.shape[-1] == 1:
            d0, _ = _d0_d1(alpha[..., 0])
            return d0
        e, o = alpha[..., 0::2], alpha[..., 1::2]
        return rate0_metric(f_minsum(e, o)) + rate0_metric(o + e)

    def node(alpha, pm, off: int, step: int, size: int):
        """Returns (β, pm, R) — β expressed under the post-subtree list
        order; ``R [B, L]`` (or None if the subtree never prunes) maps
        post-subtree slots to node-entry slots:
        ``state_after[l] = state_before[R[l]]``."""
        sub = frozen_mask[off: off + size * step: step]
        n_frozen = int(sub.sum())
        if n_frozen == size:  # rate-0: metrics only, no prune
            return (jnp.zeros(alpha.shape, jnp.int8),
                    pm + rate0_metric(alpha), None)
        if size == 1:  # info leaf: branch + prune
            a = alpha[..., 0]
            d0, d1 = _d0_d1(a)
            cand = jnp.concatenate([pm + d0, pm + d1], axis=-1)  # [B, 2L]
            if use_onehot:
                S2 = _stable_topk_onehot(cand, Lsz, dtype)       # [B, L, 2L]
                pm = _sel_metrics(S2, cand)
                bits = jnp.sum(S2[..., Lsz:], axis=-1).astype(jnp.int8)
                R = S2[..., :Lsz] + S2[..., Lsz:]                # src selection
                return bits[..., None], pm, R
            order = jnp.argsort(-cand, axis=-1, stable=True)[:, :Lsz]
            src = (order % Lsz).astype(jnp.int32)
            bits = (order // Lsz).astype(jnp.int8)
            pm = jnp.take_along_axis(cand, order, axis=-1)
            return bits[..., None], pm, src

        half = size // 2
        a_even, a_odd = alpha[..., 0::2], alpha[..., 1::2]
        beta_e, pm, R_l = node(f_minsum(a_even, a_odd), pm, off, 2 * step, half)
        if R_l is not None:
            # one fused re-index of the whole α (fewer, larger device ops)
            alpha = (_sel_apply(R_l, alpha) if use_onehot
                     else _reindex(alpha, R_l))
            a_even, a_odd = alpha[..., 0::2], alpha[..., 1::2]
        sgn = 1.0 - 2.0 * beta_e.astype(alpha.dtype)
        beta_o, pm, R_r = node(a_odd + sgn * a_even, pm, off + step,
                               2 * step, half)
        if R_r is not None:
            beta_e = (_sel_apply_bits(R_r, beta_e) if use_onehot
                      else _reindex(beta_e, R_r))
        upper = beta_e ^ beta_o
        beta = jnp.stack([upper, beta_o], axis=-1).reshape(
            *upper.shape[:-1], upper.shape[-1] * 2)
        if R_l is None:
            R = R_r
        elif R_r is None:
            R = R_l
        elif use_onehot:  # out = R_r · (R_l · in)  ⇒  R = R_r @ R_l
            R = jnp.einsum("blj,bjk->blk", R_r, R_l,
                           preferred_element_type=dtype)
        else:  # state_out[l] = state_mid[R_r[l]] = state_in[R_l[R_r[l]]]
            R = jnp.take_along_axis(R_l, R_r, axis=-1)
        return beta, pm, R

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        assert llr.ndim == 2, "SCL decode expects [batch, N]"
        batch = llr.shape[0]
        alpha = jnp.broadcast_to(llr[:, None, :], (batch, Lsz, N))
        pm = jnp.full((batch, Lsz), _NEG_INF, dtype)
        pm = pm.at[:, 0].set(0.0)
        beta, pm, _ = node(alpha, pm, 0, 1, N)
        return polar_transform(beta), pm

    return decode
