"""Polar encoder: Kronecker-butterfly transform, batched for TPU.

Semantics match the reference (``src/polar/encoder.py:12-126`` and the
iterative butterfly at ``src/polar/utils.py:219-228``): x = u·F^⊗n with
F = [[1,0],[1,1]], realized as log₂N stages where stage *s* XORs each
element at offset < 2^s of a 2^(s+1)-block with its partner 2^s away.  No
bit-reversal permutation is applied (natural-order convention), matching the
reference's decoder trellis.

The device version operates on ``[..., N]`` batches: each stage is a
reshape + XOR on the last axis — pure VPU work that XLA fuses into a handful
of kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .construction import frozen_mask_from_positions, generate_frozen_bits
from .crc import CRCCodec


def polar_transform(u):
    """Butterfly transform x = u·F^⊗n over the last axis.

    Equivalent to reference ``polar_transform_iterative``
    (``src/polar/utils.py:219-228``) but batched: stage *s* pairs positions
    ``j`` (bit *s* = 0) with ``j + 2^s`` and XORs into the former.
    """
    u = jnp.asarray(u, jnp.int8)
    N = u.shape[-1]
    n = int(np.log2(N))
    assert 1 << n == N, "length must be a power of two"
    lead = u.shape[:-1]
    x = u
    for s in range(n):
        stride = 1 << s
        xr = x.reshape(*lead, N // (2 * stride), 2, stride)
        upper = xr[..., 0, :] ^ xr[..., 1, :]
        x = jnp.stack([upper, xr[..., 1, :]], axis=-2).reshape(*lead, N)
    return x


class PolarEncoder:
    """Batched polar encoder (reference API: ``src/polar/encoder.py:12-126``).

    ``encode`` accepts ``[K]`` (or ``[K_data]`` with CRC) or any batched
    ``[..., K]`` shape and returns ``[..., N]`` codewords.
    """

    def __init__(
        self,
        N: int,
        K: int,
        frozen_bits: Optional[np.ndarray] = None,
        use_crc: bool = False,
        crc_polynomial: str = "CRC-8",
    ):
        assert N > 0 and (N & (N - 1)) == 0, "N must be a power of 2"
        assert 0 < K < N, "K must be in range (0, N)"
        self.N = N
        self.K = K
        self.n = int(np.log2(N))
        self.use_crc = use_crc
        self.crc_polynomial = crc_polynomial

        if use_crc:
            self._crc = CRCCodec(K - int(crc_polynomial.split("-")[1]), crc_polynomial)
            self.crc_len = self._crc.crc_len
            assert K > self.crc_len, f"K must exceed CRC length ({self.crc_len})"
            self.K_data = K - self.crc_len
        else:
            self._crc = None
            self.crc_len = 0
            self.K_data = K

        if frozen_bits is None:
            self.frozen_bits, self.info_bits = generate_frozen_bits(N, K)
        else:
            self.frozen_bits = np.sort(np.asarray(frozen_bits, dtype=np.int64))
            self.info_bits = np.setdiff1d(np.arange(N), self.frozen_bits)
            assert len(self.info_bits) == K, "number of info bits must equal K"

        self.frozen_mask = frozen_mask_from_positions(N, self.frozen_bits)
        self._info_idx = jnp.asarray(self.info_bits, jnp.int32)
        self._encode_jit = jax.jit(self._encode_impl)

    # -- device path ---------------------------------------------------------
    def _encode_impl(self, message):
        message = jnp.asarray(message, jnp.int8)
        if self._crc is not None:
            message = self._crc.encode(message)
        lead = message.shape[:-1]
        u = jnp.zeros((*lead, self.N), jnp.int8)
        u = u.at[..., self._info_idx].set(message)
        return polar_transform(u)

    def encode(self, message):
        """Encode messages; reference semantics at ``encoder.py:63-95``."""
        expected = self.K_data if self.use_crc else self.K
        assert np.shape(message)[-1] == expected, (
            f"message length must be {expected}, got {np.shape(message)[-1]}"
        )
        return self._encode_jit(message)

    # -- reference API surface ------------------------------------------------
    def get_info_bits_positions(self) -> np.ndarray:
        return self.info_bits.copy()

    def get_frozen_bits_positions(self) -> np.ndarray:
        return self.frozen_bits.copy()

    def get_code_rate(self) -> float:
        return self.K / self.N

    def __repr__(self) -> str:
        crc = f", CRC={self.crc_polynomial}" if self.use_crc else ""
        return f"PolarEncoder(N={self.N}, K={self.K}, rate={self.get_code_rate():.3f}{crc})"
