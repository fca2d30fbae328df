"""Pallas TPU kernels for the hot decode loops.

XLA versions of every op remain the reference implementations
(``models/``); kernels here fuse entire decode loops into single TPU
programs to eliminate per-op dispatch and HBM round-trips.
"""

from .bp_pallas import make_bp_decoder_pallas, pallas_available

__all__ = ["make_bp_decoder_pallas", "pallas_available"]
