"""Monte-Carlo simulation engine: sharded frame batches, chunked early stop,
reference-compatible BER/FER accounting (reference
``benchmarks/ber_simulation.py``)."""

from .montecarlo import ChunkStats, MonteCarloResult, MonteCarloSimulator
from .pipelines import (
    make_channel_fn,
    make_ldpc_pipeline,
    make_montecarlo_step,
    make_polar_pipeline,
)
from .sweep import run_snr_sweep

__all__ = [
    "ChunkStats",
    "MonteCarloResult",
    "MonteCarloSimulator",
    "make_montecarlo_step",
    "make_channel_fn",
    "make_polar_pipeline",
    "make_ldpc_pipeline",
    "run_snr_sweep",
]
