"""Channel models: AWGN, BSC, Rayleigh/Rician fading.

All channels are batched and functional on the device side: they consume an
explicit ``jax.random`` key and a ``[..., n]`` bit array.  The thin classes
mirror the reference API surface (``src/channel/__init__.py:5-13``).
"""

from .awgn import (
    AWGNChannel,
    awgn_capacity,
    awgn_noise_std,
    awgn_transmit,
    bpsk_demodulate_hard,
    bpsk_modulate,
    symbols_to_llr,
)
from .bsc import BSCChannel, bsc_transmit
from .fading import RayleighFadingChannel, RicianFadingChannel, rayleigh_transmit, rician_transmit

__all__ = [
    "AWGNChannel",
    "BSCChannel",
    "RayleighFadingChannel",
    "RicianFadingChannel",
    "bpsk_modulate",
    "bpsk_demodulate_hard",
    "symbols_to_llr",
    "awgn_noise_std",
    "awgn_transmit",
    "awgn_capacity",
    "bsc_transmit",
    "rayleigh_transmit",
    "rician_transmit",
]
