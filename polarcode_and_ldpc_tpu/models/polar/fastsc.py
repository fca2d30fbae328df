"""Unrolled recursive SC decoder — the TPU fast path.

The scan-based trellis decoder (``sc.py``) re-creates the reference's
(N)×(n+1) matrix walk: full-width masked vector stages, O(N²) work per
frame.  True SC work is only O(N log N); this module emits it directly by
unrolling the SC recursion at trace time into a static program over
x-subchannel segments:

* the natural-order code (encoder stage 0 = adjacent pairs,
  ``src/polar/utils.py:219-228``) decodes u-even indices through
  ``f(α[2i], α[2i+1])`` and u-odd through ``g`` — so each node deinterleaves
  its α, recurses on the even u-subcode, then the odd, and re-interleaves
  the partial sums.  The temporal leaf order this induces is exactly the
  reference's bit-reversed order (``src/polar/decoder.py:54-55``);
* frozen structure is static, so constituent nodes collapse (Sarkis et
  al., "Fast Polar Decoders: Algorithm and Implementation", JSAC 2014):
  **rate-0** (all frozen → β = 0) and **REP** (one trailing info bit →
  β = hard(Σα)) are bit-exact equivalents of min-sum SC under *all* inputs
  and are always enabled; **rate-1** (no frozen → β = hard(α)) and **SPC**
  (one leading frozen bit → hard(α) + parity-fixing flip of the least-
  reliable position) are bit-exact except on exact-zero LLRs / tied
  minimum magnitudes — zero-probability events for continuous channels —
  and are gated behind ``fast_nodes`` (on by default; turn off for
  tie-adversarial parity testing).  All verified against the NumPy twin
  in tests (tie-exact with ``fast_nodes=False``; exact on continuous
  noise with ``fast_nodes=True``).

All ops are elementwise/strided-slice over ``[..., M]`` tensors with
arbitrary leading batch axes — pure VPU work XLA fuses aggressively; no
gathers, no conds, no scan-carried (n+1)×N state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .trellis import f_minsum


def _deinterleave(alpha):
    return alpha[..., 0::2], alpha[..., 1::2]


def _interleave_bits(beta_even, beta_odd):
    """x[2i] = βe[i] ⊕ βo[i]; x[2i+1] = βo[i]."""
    upper = beta_even ^ beta_odd
    stacked = jnp.stack([upper, beta_odd], axis=-1)
    return stacked.reshape(*upper.shape[:-1], upper.shape[-1] * 2)


def _hard(alpha):
    """Hard decision: llr ≥ 0 → 0 (reference ``decoder.py:117-119``)."""
    return (alpha < 0).astype(jnp.int8)


def make_sc_decoder_unrolled(N: int, frozen_mask: np.ndarray, dtype=jnp.float32,
                             fast_nodes: bool = True):
    """Build a jittable unrolled SC decoder.

    Returns ``decode(llr: [..., N]) -> u: [..., N] int8`` (natural order),
    bit-identical to ``sc.make_sc_decoder`` and the NumPy twin.
    """
    frozen_mask = np.asarray(frozen_mask, bool)
    assert frozen_mask.shape == (N,)

    def node(alpha, off: int, step: int, size: int):
        """Decode u indices {off + k·step, k < size}; α is the x-subchannel
        vector [..., size].  Returns β (re-encoded x bits) [..., size]."""
        sub = frozen_mask[off: off + size * step: step]
        n_frozen = int(sub.sum())
        if n_frozen == size:  # rate-0
            return jnp.zeros(alpha.shape, jnp.int8)
        if size == 1:  # info leaf
            return _hard(alpha)
        if n_frozen == size - 1 and not sub[-1]:  # REP (tie-exact: pure Σ)
            bit = _hard(jnp.sum(alpha, axis=-1, keepdims=True))
            return jnp.broadcast_to(bit, alpha.shape)
        if fast_nodes and n_frozen == 0:  # rate-1: β = hard(α)
            return _hard(alpha)
        if fast_nodes and n_frozen == 1 and sub[0]:  # SPC (Wagner decode)
            bits = _hard(alpha)
            parity = (jnp.sum(bits, axis=-1, dtype=jnp.int32) & 1).astype(jnp.int8)
            worst = jnp.argmin(jnp.abs(alpha), axis=-1)
            flip = (jax.nn.one_hot(worst, size, dtype=jnp.int8)
                    * parity[..., None])
            return bits ^ flip
        half = size // 2
        a_even, a_odd = _deinterleave(alpha)
        beta_even = node(f_minsum(a_even, a_odd), off, 2 * step, half)
        sgn = (1.0 - 2.0 * beta_even.astype(alpha.dtype))
        beta_odd = node(a_odd + sgn * a_even, off + step, 2 * step, half)
        return _interleave_bits(beta_even, beta_odd)

    from .encoder import polar_transform

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        beta = node(llr, 0, 1, N)
        # β is the re-encoded codeword; u = β·G (G its own inverse)
        return polar_transform(beta)

    return decode
