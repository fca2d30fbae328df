"""Successive-cancellation (SC) polar decoder, batched for TPU.

Re-design of the reference's per-frame Python SC loop
(``src/polar/decoder.py:12-173``): frames become a leading batch axis and the
N sequential leaf decisions become one ``lax.scan`` whose per-step work is a
handful of masked full-width vector stages (see ``trellis.py``).  All frames
decode in lock-step — the control flow (leaf order, stage activity, frozen
pattern) is identical across frames, only the data differs, which is exactly
the SIMD structure a TPU wants.

Bit-exactness: with float64 inputs this reproduces the reference decoder's
output bits exactly on identical LLRs (same min-sum f, same g, same
``llr ≥ 0 → 0`` hard decision at ``decoder.py:117-119``, same decode order).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .construction import frozen_mask_from_positions, generate_frozen_bits
from .schedule import build_schedule
from .trellis import leaf_llr, propagate_bits, set_leaf_bit, update_llr_columns


def make_sc_decoder(N: int, frozen_mask: np.ndarray, dtype=jnp.float32,
                    impl: str = "unrolled"):
    """Build a jittable SC decoder for a fixed code.

    Returns ``decode(llr: [..., N]) -> u: [..., N] int8`` (full u-vector in
    natural order; callers extract info positions).

    ``impl``: ``"unrolled"`` (default — O(N log N) recursive fast path with
    exact rate-0/rate-1/REP/SPC node shortcuts, see ``fastsc.py``),
    ``"mega"`` (the same recursion fused into ONE Pallas kernel per batch
    tile, ``ops/sc_mega_pallas.py``; ``"mega-interpret"`` is its
    CPU-testable twin), or ``"scan"`` (the reference-trellis ``lax.scan``
    formulation below).  All are bit-identical to the reference and to
    each other (fast rate-1/SPC shortcuts exact on continuous channels).
    """
    if impl == "unrolled":
        from .fastsc import make_sc_decoder_unrolled

        return make_sc_decoder_unrolled(N, frozen_mask, dtype)
    if impl in ("mega", "mega-interpret"):
        from ...ops.sc_mega_pallas import make_sc_decoder_mega

        return make_sc_decoder_mega(N, frozen_mask, dtype,
                                    interpret=impl == "mega-interpret")
    assert impl == "scan", f"unknown impl {impl!r}"
    sched = build_schedule(N, frozen_mask)
    n = sched.n
    xs = {
        "leaf": jnp.asarray(sched.leaf),
        "frozen": jnp.asarray(sched.frozen),
        "llr_act": jnp.asarray(sched.llr_active),
        "bit_act": jnp.asarray(sched.bit_active),
    }

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        lead = llr.shape[:-1]
        L = jnp.zeros((*lead, n + 1, N), dtype)
        L = L.at[..., 0, :].set(llr)
        B = jnp.zeros((*lead, n + 1, N), jnp.int8)

        def step(carry, x):
            L, B = carry
            l = x["leaf"]
            L = update_llr_columns(L, B, l, x["llr_act"])
            dec_llr = leaf_llr(L, l)
            # hard decision: llr >= 0 → 0 (decoder.py:117-119); frozen → 0
            bit = jnp.where(x["frozen"], jnp.zeros_like(dec_llr, jnp.int8),
                            (dec_llr < 0).astype(jnp.int8))
            B = set_leaf_bit(B, l, bit)
            B = propagate_bits(B, l, x["bit_act"])
            return (L, B), None

        (L, B), _ = lax.scan(step, (L, B), xs)
        return B[..., n, :]

    return decode


class SCDecoder:
    """Batched SC decoder (reference API: ``src/polar/decoder.py:12-173``).

    ``decode`` accepts ``[N]`` or ``[..., N]`` channel LLRs (positive ⇒ bit 0
    more likely) and returns the K info bits per frame.
    """

    def __init__(self, N: int, K: int, frozen_bits: Optional[np.ndarray] = None,
                 dtype=jnp.float32, impl: str = "unrolled"):
        assert N > 0 and (N & (N - 1)) == 0, "N must be a power of 2"
        assert 0 < K < N, "K must be in (0, N)"
        self.N = N
        self.K = K
        self.n = int(np.log2(N))
        if frozen_bits is None:
            self.frozen_bits, self.info_bits = generate_frozen_bits(N, K)
        else:
            self.frozen_bits = np.sort(np.asarray(frozen_bits, dtype=np.int64))
            self.info_bits = np.setdiff1d(np.arange(N), self.frozen_bits)
        self.frozen_mask = frozen_mask_from_positions(N, self.frozen_bits)
        self.dtype = dtype
        self._info_idx = jnp.asarray(self.info_bits, jnp.int32)
        self._decode_full = jax.jit(make_sc_decoder(N, self.frozen_mask, dtype,
                                                    impl=impl))

    def decode_full(self, llr):
        """Decode to the full u-vector ``[..., N]``."""
        return self._decode_full(llr)

    def decode(self, llr):
        """Decode to info bits ``[..., K]`` (reference ``decoder.py:38-71``)."""
        u = self._decode_full(llr)
        return u[..., self._info_idx]

    def __repr__(self) -> str:
        return f"SCDecoder(N={self.N}, K={self.K})"
