"""Fading channels: Rayleigh (reference parity) and Rician (reference gap-fill).

Reference semantics (``src/channel/fading.py:10-66``):
* per-symbol complex gain h ~ CN(0, 1); received = |h|·s + noise
* CSI-aware LLR = 2·y·|h| / σ²
* hard decision y ≤ 0 → 1

``RicianFadingChannel`` is named in the reference's ``ARCHITECTURE.md:93`` but
never implemented there; provided here with a K-factor line-of-sight term.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .awgn import awgn_noise_std, bpsk_modulate


def fading_apply(bits, snr_db, h_mag, noise, return_llr=True, dtype=jnp.float32):
    """Deterministic fading chain given explicit |h| and standard-normal
    noise (the parity-injection path, mirrored in ``parity/channel_np``)."""
    std = awgn_noise_std(snr_db)
    symbols = bpsk_modulate(bits, dtype)
    received = h_mag * symbols + jnp.asarray(noise, dtype) * std
    if return_llr:
        return 2.0 * received * h_mag / (std * std)
    return (received <= 0).astype(jnp.int8)


def _fading_core(key, bits, snr_db, h_mag_fn, return_llr, dtype):
    k_h, k_n = jax.random.split(key)
    h_mag = h_mag_fn(k_h, jnp.shape(bits), dtype)
    noise = jax.random.normal(k_n, jnp.shape(bits), dtype)
    return fading_apply(bits, snr_db, h_mag, noise, return_llr, dtype)


def _rayleigh_mag(key, shape, dtype):
    kr, ki = jax.random.split(key)
    scale = 1.0 / math.sqrt(2.0)
    h_real = jax.random.normal(kr, shape, dtype) * scale
    h_imag = jax.random.normal(ki, shape, dtype) * scale
    return jnp.sqrt(h_real * h_real + h_imag * h_imag)


def rayleigh_transmit(key, bits, snr_db: float, return_llr: bool = True, dtype=jnp.float32):
    """Rayleigh-faded BPSK over AWGN (reference ``fading.py:30-63``)."""
    return _fading_core(key, bits, snr_db, _rayleigh_mag, return_llr, dtype)


def rician_transmit(
    key, bits, snr_db: float, k_factor: float = 1.0, return_llr: bool = True, dtype=jnp.float32
):
    """Rician fading with K-factor (LOS power / scattered power).

    h = sqrt(K/(K+1)) + CN(0, 1/(K+1)); K→0 degenerates to Rayleigh.
    """

    def mag(kh, shape, dtype):
        kr, ki = jax.random.split(kh)
        los = math.sqrt(k_factor / (k_factor + 1.0))
        scale = math.sqrt(1.0 / (2.0 * (k_factor + 1.0)))
        h_real = los + jax.random.normal(kr, shape, dtype) * scale
        h_imag = jax.random.normal(ki, shape, dtype) * scale
        return jnp.sqrt(h_real * h_real + h_imag * h_imag)

    return _fading_core(key, bits, snr_db, mag, return_llr, dtype)


class RayleighFadingChannel:
    """Reference API (``src/channel/fading.py:10-66``) with explicit keys."""

    def __init__(self, snr_db: float, seed: Optional[int] = None, dtype=jnp.float32):
        self.snr_db = snr_db
        self.snr_linear = 10.0 ** (snr_db / 10.0)
        self.noise_std = awgn_noise_std(snr_db)
        self.dtype = dtype
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._transmit_jit = {
            ret: jax.jit(lambda key, bits, _r=ret: rayleigh_transmit(
                key, bits, snr_db, _r, dtype))
            for ret in (False, True)
        }

    def transmit(self, bits, return_llr: bool = True, key=None):
        if key is None:
            self._key, key = jax.random.split(self._key)
        return self._transmit_jit[bool(return_llr)](key, bits)

    def __repr__(self) -> str:
        return f"RayleighFadingChannel(SNR={self.snr_db:.2f}dB)"


class RicianFadingChannel:
    """Rician fading (gap-fill: named at reference ``ARCHITECTURE.md:93``,
    unimplemented there)."""

    def __init__(self, snr_db: float, k_factor: float = 1.0, seed: Optional[int] = None, dtype=jnp.float32):
        self.snr_db = snr_db
        self.k_factor = k_factor
        self.noise_std = awgn_noise_std(snr_db)
        self.dtype = dtype
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._transmit_jit = {
            ret: jax.jit(lambda key, bits, _r=ret: rician_transmit(
                key, bits, snr_db, k_factor, _r, dtype))
            for ret in (False, True)
        }

    def transmit(self, bits, return_llr: bool = True, key=None):
        if key is None:
            self._key, key = jax.random.split(self._key)
        return self._transmit_jit[bool(return_llr)](key, bits)

    def __repr__(self) -> str:
        return f"RicianFadingChannel(SNR={self.snr_db:.2f}dB, K={self.k_factor})"
