"""Error-rate and throughput metrics (reference ``src/utils/metrics.py``).

Host-side NumPy versions mirror the reference API; ``ber_fer_counts`` is the
device-side jittable primitive the Monte-Carlo layer reduces with (the
reference's scalar accumulators at ``benchmarks/ber_simulation.py:181-188``
become one vectorized count + ``psum``-style reduction here).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def calculate_ber(original, decoded) -> float:
    """Bit error rate (reference ``metrics.py:12-28``)."""
    original = np.asarray(original)
    decoded = np.asarray(decoded)
    assert original.shape == decoded.shape, "shape mismatch"
    if original.size == 0:
        return 0.0
    return float(np.mean(original != decoded))


def calculate_fer(original_frames, decoded_frames) -> float:
    """Frame error rate over lists/batches of frames (``metrics.py:31-52``)."""
    original = np.asarray(original_frames)
    decoded = np.asarray(decoded_frames)
    assert original.shape == decoded.shape, "shape mismatch"
    if original.ndim == 1:
        return float(np.any(original != decoded))
    frames = original.reshape(-1, original.shape[-1])
    dframes = decoded.reshape(-1, decoded.shape[-1])
    if frames.shape[0] == 0:
        return 0.0
    return float(np.mean(np.any(frames != dframes, axis=-1)))


def calculate_throughput(num_bits: int, elapsed_seconds: float) -> float:
    """Throughput in Mbps (``metrics.py:55-69``)."""
    if elapsed_seconds <= 0:
        return 0.0
    return num_bits / elapsed_seconds / 1e6


def wilson_confidence_interval(errors: int, trials: int, confidence: float = 0.95):
    """Wilson score interval for an error probability (``metrics.py:138-167``)."""
    if trials == 0:
        return 0.0, 0.0
    # two-sided normal quantile via inverse error function
    z = math.sqrt(2.0) * _erfinv(confidence)
    p = errors / trials
    denom = 1.0 + z * z / trials
    center = (p + z * z / (2 * trials)) / denom
    half = (z / denom) * math.sqrt(p * (1 - p) / trials + z * z / (4 * trials * trials))
    return max(0.0, center - half), min(1.0, center + half)


def _erfinv(x: float) -> float:
    # scipy-free inverse erf (Winitzki approximation refined by one Newton step)
    a = 0.147
    ln1mx2 = math.log(1 - x * x)
    t = 2.0 / (math.pi * a) + ln1mx2 / 2.0
    y = math.copysign(math.sqrt(math.sqrt(t * t - ln1mx2 / a) - t), x)
    # Newton refinement: f(y) = erf(y) - x
    for _ in range(2):
        err = math.erf(y) - x
        y -= err * math.sqrt(math.pi) / 2.0 * math.exp(y * y)
    return y


def snr_to_ebn0(snr_db: float, code_rate: float, bits_per_symbol: int = 1) -> float:
    """Es/N0 [dB] → Eb/N0 [dB] (``metrics.py:170-182``)."""
    return snr_db - 10.0 * math.log10(code_rate * bits_per_symbol)


def ebn0_to_snr(ebn0_db: float, code_rate: float, bits_per_symbol: int = 1) -> float:
    """Eb/N0 [dB] → Es/N0 [dB] (``metrics.py:184-195``)."""
    return ebn0_db + 10.0 * math.log10(code_rate * bits_per_symbol)


# -- device-side primitives ----------------------------------------------------

def ber_fer_counts(original, decoded):
    """Jittable error counters for a batch of frames.

    Args:
        original, decoded: ``[batch, k]`` bit arrays.
    Returns:
        (bit_errors, frame_errors) scalar int32 — the quantities the
        reference accumulates per frame (``ber_simulation.py:181-188``).
    """
    diff = (original != decoded)
    bit_errors = jnp.sum(diff, dtype=jnp.int64)
    frame_errors = jnp.sum(jnp.any(diff, axis=-1), dtype=jnp.int64)
    return bit_errors, frame_errors
