"""Binary symmetric channel (reference ``src/channel/bsc.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bsc_transmit(key, bits, crossover_prob: float):
    """Flip each bit independently with probability ``crossover_prob``
    (reference ``bsc.py:32-49``)."""
    bits = jnp.asarray(bits, jnp.int8)
    flips = jax.random.bernoulli(key, crossover_prob, bits.shape)
    return jnp.where(flips, 1 - bits, bits).astype(jnp.int8)


def bsc_llr(bits, crossover_prob: float, dtype=jnp.float32):
    """LLR for a BSC output: log((1-p)/p) for a received 0, −log((1-p)/p) for 1.

    The reference never computes BSC LLRs (its BSC path is hard-decision
    only); provided here so BSC outputs can drive the soft decoders too.

    The magnitude is saturated to ±20 (the BP ``_SAT`` convention,
    reference ``src/ldpc/decoder.py:94``): a degenerate channel with
    ``p ∈ {0, 1}`` would otherwise emit ±inf LLRs, and the one-hot matmul
    gather path (``models/ldpc/graph.py``) is exact only for finite
    messages (``0 × inf = NaN``).
    """
    import math

    _SAT = 20.0
    if crossover_prob <= 0.0 or crossover_prob >= 1.0:
        mag = _SAT
        if crossover_prob >= 1.0:
            mag = -_SAT
    else:
        mag = min(max(math.log((1.0 - crossover_prob) / crossover_prob),
                      -_SAT), _SAT)
    return (1.0 - 2.0 * jnp.asarray(bits, dtype)) * mag


class BSCChannel:
    """Reference API (``src/channel/bsc.py:10-52``) with explicit keys."""

    def __init__(self, crossover_prob: float, seed: Optional[int] = None):
        assert 0.0 <= crossover_prob <= 1.0, "crossover probability must be in [0, 1]"
        self.crossover_prob = crossover_prob
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._transmit_jit = jax.jit(
            lambda key, bits: bsc_transmit(key, bits, crossover_prob))

    def transmit(self, bits, key=None, return_llr: bool = False):
        if key is None:
            self._key, key = jax.random.split(self._key)
        out = self._transmit_jit(key, jnp.asarray(bits, jnp.int8))
        if return_llr:
            return bsc_llr(out, self.crossover_prob)
        return out

    def __repr__(self) -> str:
        return f"BSCChannel(crossover_prob={self.crossover_prob})"
