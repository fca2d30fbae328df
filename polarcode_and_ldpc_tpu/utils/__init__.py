"""Metrics, reporting, and analysis utilities (reference ``src/utils/`` and
``benchmarks/complexity_analysis.py``)."""

from .metrics import (
    calculate_ber,
    calculate_fer,
    calculate_throughput,
    ebn0_to_snr,
    snr_to_ebn0,
    wilson_confidence_interval,
)
from .complexity import analyze_complexity, ldpc_complexity, polar_complexity
from .visualization import plot_ber_curves, plot_comparison, save_results
from .tracing import DecodeRateCounter, Timer, profile_trace, timed_span, trace_sc_trellis

__all__ = [
    "calculate_ber",
    "calculate_fer",
    "calculate_throughput",
    "wilson_confidence_interval",
    "snr_to_ebn0",
    "ebn0_to_snr",
    "polar_complexity",
    "ldpc_complexity",
    "analyze_complexity",
    "plot_ber_curves",
    "plot_comparison",
    "save_results",
    "Timer",
    "timed_span",
    "profile_trace",
    "DecodeRateCounter",
    "trace_sc_trellis",
]
