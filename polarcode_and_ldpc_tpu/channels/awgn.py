"""AWGN channel with BPSK modulation and LLR demodulation.

Semantics match the reference exactly (``src/channel/awgn.py``):

* BPSK map 0 → +1, 1 → −1 (``awgn.py:37-47``)
* noise std σ = sqrt(1 / (2·SNR_lin)) — snr_db is treated as Es/N0 with no
  code-rate adjustment (``awgn.py:29-32``)
* LLR = 2·y / σ² with LLR>0 meaning "bit 0 more likely" (``awgn.py:61-76``)
* hard demod: y ≤ 0 → 1 (``awgn.py:49-59``)
* capacity approximation C ≈ 1 − log2(1 + exp(−SNR_lin)) (``awgn.py:114-126``)

The device path is batched and key-based; ``noise`` can be supplied
explicitly for bit-exact parity tests against the NumPy twin
(``polarcode_and_ldpc_tpu.parity.channel_np``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


def awgn_noise_std(snr_db):
    """σ = sqrt(1/(2·SNR_lin)) — reference ``awgn.py:29-32``.

    Accepts a Python float (computed on host in float64, the bit-exact
    parity path) or a traced JAX scalar (computed on device, enabling one
    compiled Monte-Carlo step to serve a whole SNR sweep — the runtime-SNR
    pipelines in ``sim.pipelines``)."""
    if isinstance(snr_db, (int, float)):
        snr_linear = 10.0 ** (snr_db / 10.0)
        return math.sqrt(1.0 / (2.0 * snr_linear))
    snr_linear = 10.0 ** (jnp.asarray(snr_db) / 10.0)
    return jnp.sqrt(1.0 / (2.0 * snr_linear))


def bpsk_modulate(bits, dtype=jnp.float32):
    """0 → +1, 1 → −1 (reference ``awgn.py:37-47``)."""
    return (1.0 - 2.0 * jnp.asarray(bits, dtype)).astype(dtype)


def bpsk_demodulate_hard(symbols):
    """y ≤ 0 → 1 (reference ``awgn.py:49-59``)."""
    return (symbols <= 0).astype(jnp.int8)


def symbols_to_llr(symbols, noise_std: float):
    """LLR = 2y/σ² (reference ``awgn.py:61-76``)."""
    return 2.0 * symbols / (noise_std * noise_std)


def awgn_transmit(
    key,
    bits,
    snr_db: float,
    return_llr: bool = True,
    dtype=jnp.float32,
    noise: Optional[jax.Array] = None,
):
    """Full modulate → noise → demodulate chain (reference ``awgn.py:91-112``).

    Args:
        key: PRNG key (ignored when ``noise`` is given).
        bits: ``[..., n]`` bit array.
        noise: optional pre-drawn *standard-normal* noise of ``bits.shape``
            (used by the parity harness to feed identical realizations to
            both device and NumPy implementations).
    """
    std = awgn_noise_std(snr_db)
    symbols = bpsk_modulate(bits, dtype)
    if noise is None:
        noise = jax.random.normal(key, symbols.shape, dtype)
    received = symbols + std * jnp.asarray(noise, dtype)
    if return_llr:
        return symbols_to_llr(received, std)
    return bpsk_demodulate_hard(received)


def awgn_capacity(snr_db: float) -> float:
    """C ≈ 1 − log2(1 + exp(−SNR_lin)) (reference ``awgn.py:114-126``)."""
    snr_linear = 10.0 ** (snr_db / 10.0)
    return float(1.0 - math.log2(1.0 + math.exp(-snr_linear)))


class AWGNChannel:
    """API-compatible wrapper mirroring the reference class
    (``src/channel/awgn.py:11-140``) with explicit-key randomness."""

    def __init__(self, snr_db: float, seed: Optional[int] = None, dtype=jnp.float32):
        self.dtype = dtype
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self.update_snr(snr_db)

    # -- reference API ------------------------------------------------------
    def update_snr(self, snr_db: float) -> None:
        """Reference ``awgn.py:128-137``."""
        self.snr_db = snr_db
        self.snr_linear = 10.0 ** (snr_db / 10.0)
        self.noise_std = awgn_noise_std(snr_db)
        # one fused program per (snr, return_llr) instead of eager per-op
        # dispatch (the ambient remote-TPU path makes eager ops very costly)
        self._transmit_jit = {
            ret: jax.jit(functools.partial(awgn_transmit, snr_db=snr_db,
                                           return_llr=ret, dtype=self.dtype))
            for ret in (False, True)
        }

    def modulate_bpsk(self, bits):
        return bpsk_modulate(bits, self.dtype)

    def demodulate_bpsk_hard(self, symbols):
        return bpsk_demodulate_hard(symbols)

    def symbols_to_llr(self, symbols):
        return symbols_to_llr(jnp.asarray(symbols, self.dtype), self.noise_std)

    def add_noise(self, symbols, key=None):
        key = self._next_key(key)
        noise = jax.random.normal(key, jnp.shape(symbols), self.dtype)
        return jnp.asarray(symbols, self.dtype) + self.noise_std * noise

    def transmit(self, bits, return_llr: bool = True, key=None, noise=None):
        key = self._next_key(key)
        if noise is not None:  # parity path: explicit noise, eager is fine
            return awgn_transmit(key, bits, self.snr_db, return_llr,
                                 self.dtype, noise)
        return self._transmit_jit[bool(return_llr)](key, bits)

    def get_capacity(self) -> float:
        return awgn_capacity(self.snr_db)

    # -- internals -----------------------------------------------------------
    def _next_key(self, key):
        if key is not None:
            return key
        self._key, sub = jax.random.split(self._key)
        return sub

    def __repr__(self) -> str:
        return f"AWGNChannel(SNR={self.snr_db:.2f}dB, noise_std={self.noise_std:.4f})"
