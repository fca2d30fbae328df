"""CRC codec over GF(2), vectorized for TPU.

The reference computes CRCs bit-serially (``src/polar/utils.py:86-163``:
MSB-first, init 0, no reflection, no final XOR; polynomials CRC-8 0x1D,
CRC-16 0x1021, CRC-24 0x1864CFB).  A CRC with zero init is *linear* over
GF(2), so for a fixed message length it is a GF(2) matrix product — which is
how the device path computes it: one small int8 matmul on the MXU per batch,
instead of a per-bit loop.  The matrix is built host-side by running the
bit-serial recurrence on unit vectors.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np

CRC_POLYNOMIALS = {
    "CRC-8": 0x1D,
    "CRC-16": 0x1021,
    "CRC-24": 0x1864CFB,  # 5G NR CRC24A
}


def crc_length(polynomial: str) -> int:
    return int(polynomial.split("-")[1])


def crc_remainder_scalar(bits: Sequence[int], polynomial: str = "CRC-8") -> int:
    """Bit-serial CRC register matching reference semantics
    (``utils.py:110-119``).  Host-side / test use only."""
    poly = CRC_POLYNOMIALS.get(polynomial, CRC_POLYNOMIALS["CRC-8"])
    crc_len = crc_length(polynomial if polynomial in CRC_POLYNOMIALS else "CRC-8")
    msb = 1 << (crc_len - 1)
    mask = (1 << crc_len) - 1
    crc = 0
    for bit in bits:
        crc ^= int(bit) << (crc_len - 1)
        crc = ((crc << 1) ^ poly) if (crc & msb) else (crc << 1)
        crc &= mask
    return crc


@functools.lru_cache(maxsize=None)
def _crc_matrix(data_len: int, polynomial: str) -> np.ndarray:
    """GF(2) matrix M [data_len, crc_len] with CRC(data) = data @ M mod 2."""
    crc_len = crc_length(polynomial)
    M = np.zeros((data_len, crc_len), dtype=np.int8)
    for i in range(data_len):
        unit = np.zeros(data_len, dtype=np.int8)
        unit[i] = 1
        r = crc_remainder_scalar(unit, polynomial)
        M[i] = [(r >> (crc_len - 1 - b)) & 1 for b in range(crc_len)]
    return M


class CRCCodec:
    """Batched CRC encode/check for a fixed data length."""

    def __init__(self, data_len: int, polynomial: str = "CRC-8"):
        if polynomial not in CRC_POLYNOMIALS:
            polynomial = "CRC-8"
        self.polynomial = polynomial
        self.crc_len = crc_length(polynomial)
        self.data_len = data_len
        self._enc_matrix = jnp.asarray(_crc_matrix(data_len, polynomial))
        self._chk_matrix = jnp.asarray(_crc_matrix(data_len + self.crc_len, polynomial))

    def encode(self, data):
        """Append CRC bits: ``[..., data_len] → [..., data_len + crc_len]``."""
        data = jnp.asarray(data, jnp.int8)
        crc = jnp.dot(
            data.astype(jnp.int32), self._enc_matrix.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        ) % 2
        return jnp.concatenate([data, crc.astype(jnp.int8)], axis=-1)

    def check(self, data_with_crc):
        """True where the CRC of ``[..., data_len + crc_len]`` passes."""
        bits = jnp.asarray(data_with_crc, jnp.int32)
        rem = jnp.dot(bits, self._chk_matrix.astype(jnp.int32), preferred_element_type=jnp.int32) % 2
        return jnp.all(rem == 0, axis=-1)


def crc_encode(data, polynomial: str = "CRC-8"):
    """Functional form mirroring reference ``crc_encode`` (``utils.py:86-125``).

    Accepts ``[..., L]``; appends the CRC along the last axis.
    """
    codec = CRCCodec(int(np.shape(data)[-1]), polynomial)
    return codec.encode(data)


def crc_check(data, polynomial: str = "CRC-8"):
    """Functional form mirroring reference ``crc_check`` (``utils.py:128-163``).

    Returns a boolean (or boolean array for batched input).
    """
    if polynomial not in CRC_POLYNOMIALS:
        polynomial = "CRC-8"
    total_len = int(np.shape(data)[-1])
    codec = CRCCodec(total_len - crc_length(polynomial), polynomial)
    out = codec.check(data)
    if out.ndim == 0:
        return bool(out)
    return out
