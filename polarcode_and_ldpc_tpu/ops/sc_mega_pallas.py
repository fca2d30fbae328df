"""Whole-decode SC Pallas kernel — the entire SC recursion in ONE kernel.

The unrolled SC fast path (``models/polar/fastsc.py``) is already
O(N log N) work, but XLA runs it as ~10³ small elementwise ops whose
intermediates bounce through HBM between fusion islands — at the
measured 1.17 Gbps (N=1024, batch 16384) the chip executes only ~20-30
Gop/s of f/g arithmetic, i.e. the decoder is op-overhead-bound, not
compute- or bandwidth-bound.  SC has no list axis and no permutation
algebra, so (unlike SCL, where the same fusion was a measured negative —
see ``scl_mega_pallas.py``) the whole recursion fits one kernel with a
tiny VMEM footprint: channel LLRs in (``[N, B_tile]`` f32, 0.5 MB at
flagship), re-encoded codeword bits out (``[N, B_tile]`` int8), live
recursion state ~2 copies of the LLR block.

Layout mirrors ``scanscl``: bit-reversed storage so every
even/odd deinterleave of the natural-order recursion
(``fastsc._deinterleave``) becomes a contiguous half-split, and the
combine is ``concat([left ^ right, right])``; batch rides the 128-lane
axis.  Fast constituent nodes (Sarkis et al., JSAC 2014) keep their
exact semantics: rate-0 and REP are tie-exact equivalents of min-sum
SC; rate-1 and SPC are exact on continuous channels (no zero-LLR /
tied-magnitude events) and gated behind ``fast_nodes`` exactly like the
XLA path.  SPC's least-reliable-position flip uses an iota-min
first-argmin (Mosaic-safe) with the same first-minimum tie rule as
``jnp.argmin``.

Reference semantics: /root/reference/src/polar/decoder.py:12-173 (SC);
hard decision llr >= 0 -> 0 (:117-119).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.polar.construction import bit_reverse_permutation
from ..models.polar.trellis import f_minsum


def _hard_nb(alpha):
    """Hard decision on batch-last LLRs: llr >= 0 -> 0."""
    return (alpha < 0).astype(jnp.int8)


def make_sc_core_nb(N: int, frozen_rev: np.ndarray, dtype,
                    fast_nodes: bool = True):
    """Batch-last SC recursion over bit-reversed storage.

    ``core(llr_nb [N, B]) -> beta_nb [N, B] int8`` (re-encoded codeword in
    bit-reversed storage).  Pure jnp — traced both under XLA (twin /
    fallback) and inside the Pallas kernel; identical programs, so the
    kernel is bit-identical to the twin by construction.
    """
    frozen_rev = np.asarray(frozen_rev, bool)
    assert frozen_rev.shape == (N,)

    def node(alpha, off: int, size: int):
        sub = frozen_rev[off:off + size]
        n_frozen = int(sub.sum())
        if n_frozen == size:  # rate-0
            return jnp.zeros(alpha.shape, jnp.int8)
        if size == 1:  # info leaf
            return _hard_nb(alpha)
        if n_frozen == size - 1 and not sub[-1]:  # REP (tie-exact)
            bit = _hard_nb(jnp.sum(alpha, axis=0, keepdims=True))
            return jnp.broadcast_to(bit, alpha.shape)
        if fast_nodes and n_frozen == 0:  # rate-1
            return _hard_nb(alpha)
        if fast_nodes and n_frozen == 1 and sub[0]:  # SPC (Wagner)
            bits = _hard_nb(alpha)
            parity = (jnp.sum(bits, axis=0, dtype=jnp.int32) & 1)  # [B]
            mag = jnp.abs(alpha)
            mmin = jnp.min(mag, axis=0, keepdims=True)              # [1, B]
            iota = lax.broadcasted_iota(jnp.int32, alpha.shape, 0)
            # first position attaining the minimum (jnp.argmin tie rule)
            first = jnp.min(jnp.where(mag == mmin, iota, size), axis=0,
                            keepdims=True)                          # [1, B]
            flip = ((iota == first)
                    & (parity[None, :] == 1)).astype(jnp.int8)
            return bits ^ flip
        half = size // 2
        first_h, second_h = alpha[:half, :], alpha[half:, :]
        beta_l = node(f_minsum(first_h, second_h), off, half)
        sgn = 1.0 - 2.0 * beta_l.astype(alpha.dtype)
        beta_r = node(second_h + sgn * first_h, off + half, half)
        return jnp.concatenate([beta_l ^ beta_r, beta_r], axis=0)

    def core(llr_nb):
        return node(jnp.asarray(llr_nb, dtype), 0, N)

    return core


def _polar_transform_nb(beta_nb, N: int):
    """In-kernel butterfly u = β·G along the sublane axis, storage order.

    F^⊗n is invariant under simultaneous row+column bit-reversal (its
    (i, j) entry depends only on the multiset of bit pairs), so applying
    the natural-order butterfly to the bit-reversed-storage vector yields
    the bit-reversed-storage transform — callers un-permute rows once at
    the JAX level.  3D slice forms only (4D reshapes blow Mosaic's scoped
    VMEM — measured 21 MB at a 512-lane tile)."""
    x = beta_nb
    B = x.shape[-1]
    s = 1
    while s < N:
        x3 = x.reshape(N // (2 * s), 2 * s, B)
        upper = x3[:, :s] ^ x3[:, s:]
        x = jnp.concatenate([upper, x3[:, s:]], axis=1).reshape(N, B)
        s *= 2
    return x


#: measured Mosaic scoped-stack cost of the fused recursion+transform:
#: ~10.5 live buffers of N×tile×4 bytes (21 MB at N=1024/tile=512,
#: 41.8 MB at N=4096/tile=256 — both VMEM-OOM'd; N=1024/tile=256 fits)
_SC_MEGA_BYTES_PER_ELEM = 42
_SC_MEGA_VMEM_BUDGET = 13 * 1024 * 1024


def make_sc_decoder_mega(N: int, frozen_mask: np.ndarray, dtype=jnp.float32,
                         fast_nodes: bool = True, batch_tile: int = 256,
                         interpret: bool = False):
    """Build the fused SC decoder: ``decode(llr [..., N]) -> u [..., N]``
    int8 in natural order — same contract as ``fastsc``/``sc``.  The
    kernel also runs the final butterfly (u = β·G) so the only JAX-level
    glue is the bit-reversal gather + batch transpose on each side.
    Batches that don't fill a lane tile run the identical XLA program
    instead.

    The batch tile auto-shrinks so the kernel's scoped VMEM fits the
    core; lane tiles below 128 are rejected by the Pallas TPU lowering,
    so codes too large for one kernel (N ≥ 4096) run HYBRID: the top
    f/g splits of the recursion execute at the XLA level and each
    largest-fitting subtree is one kernel (the subtree decode is the
    identical ``make_sc_core_nb`` program on its contiguous
    bit-reversed-storage slice, so outputs stay bit-exact); the final
    butterfly then runs at the XLA level.
    """
    frozen_mask = np.asarray(frozen_mask, bool)
    rev = np.asarray(bit_reverse_permutation(N))
    frozen_rev = frozen_mask[rev]
    core = make_sc_core_nb(N, frozen_rev, dtype, fast_nodes)
    rev_j = jnp.asarray(rev, jnp.int32)

    def _fit_tile(size: int, tile: int) -> int:
        while (tile >= 128
               and size * tile * _SC_MEGA_BYTES_PER_ELEM
               > _SC_MEGA_VMEM_BUDGET):
            tile //= 2
        return tile

    batch_tile = max(_fit_tile(N, batch_tile), 128)
    kernel_ok = (N * batch_tile * _SC_MEGA_BYTES_PER_ELEM
                 <= _SC_MEGA_VMEM_BUDGET)
    # hybrid split: largest subtree size whose kernel fits a 128-lane tile
    sub_n = N
    while (sub_n > 128
           and sub_n * 128 * _SC_MEGA_BYTES_PER_ELEM > _SC_MEGA_VMEM_BUDGET):
        sub_n //= 2
    hybrid_ok = not kernel_ok and sub_n >= 512  # tiny kernels aren't worth it

    def _make_sub_kernel(off: int):
        sub_core = make_sc_core_nb(sub_n, frozen_rev[off:off + sub_n],
                                   dtype, fast_nodes)

        def kern(a_ref, b_ref):
            b_ref[:] = sub_core(a_ref[:])

        def run(alpha):  # [sub_n, B] -> beta [sub_n, B] int8
            B = alpha.shape[-1]
            return pl.pallas_call(
                kern,
                grid=(B // batch_tile,),
                in_specs=[pl.BlockSpec((sub_n, batch_tile),
                                       lambda b: (0, b),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((sub_n, batch_tile),
                                       lambda b: (0, b),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((sub_n, B), jnp.int8),
                interpret=interpret,
            )(alpha)

        return run

    if hybrid_ok:
        sub_kernels = {off: _make_sub_kernel(off)
                       for off in range(0, N, sub_n)
                       if not frozen_rev[off:off + sub_n].all()}

        def node_top(alpha, off: int, size: int):
            # same shortcuts as make_sc_core_nb's top levels; kernels at
            # the cut (all-frozen subtrees collapse without a kernel)
            if frozen_rev[off:off + size].all():
                return jnp.zeros(alpha.shape, jnp.int8)
            if size == sub_n:
                return sub_kernels[off](alpha)
            half = size // 2
            first_h, second_h = alpha[:half, :], alpha[half:, :]
            beta_l = node_top(f_minsum(first_h, second_h), off, half)
            sgn = 1.0 - 2.0 * beta_l.astype(alpha.dtype)
            beta_r = node_top(second_h + sgn * first_h, off + half, half)
            return jnp.concatenate([beta_l ^ beta_r, beta_r], axis=0)

    def kernel(llr_ref, u_ref):
        u_ref[:] = _polar_transform_nb(core(llr_ref[:]), N)

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        lead = llr.shape[:-1]
        flat = llr.reshape((-1, N))
        B = flat.shape[0]
        llr_nb = jnp.transpose(flat[:, rev_j], (1, 0))  # [N, B]
        if kernel_ok and B % batch_tile == 0:
            u_nb = pl.pallas_call(
                kernel,
                grid=(B // batch_tile,),
                in_specs=[pl.BlockSpec((N, batch_tile), lambda b: (0, b),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((N, batch_tile), lambda b: (0, b),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, B), jnp.int8),
                interpret=interpret,
            )(llr_nb)
        elif hybrid_ok and B % batch_tile == 0:
            u_nb = _polar_transform_nb(node_top(llr_nb, 0, N), N)
        else:
            u_nb = _polar_transform_nb(core(llr_nb), N)
        # rows are bit-reversed storage: un-permute, batch back to front
        u = jnp.transpose(u_nb, (1, 0))[:, rev_j]
        return u.reshape(*lead, N)

    return decode
