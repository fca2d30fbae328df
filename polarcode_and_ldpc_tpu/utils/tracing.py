"""Tracing & profiling utilities (SURVEY §5 "auxiliary subsystems").

The reference instruments with ad-hoc ``time.time()`` spans
(``benchmarks/throughput_test.py:212-253``) and per-step trellis dumps in
debug scripts (``debug_scripts/trace_llr_updates.py``,
``compare_step_by_step.py:36-44``).  TPU-native equivalents:

* ``timed_span`` / ``Timer`` — fenced wall-clock spans
  (``block_until_ready`` so device work is actually counted);
* ``profile_trace`` — a ``jax.profiler`` trace context writing TensorBoard-
  compatible traces (open with xprof/TensorBoard);
* ``decode_rate_counter`` — decoded-bits/s/chip accounting;
* ``trace_sc_trellis`` — the algorithm-level tracer: full (n+1)×N LLR/bit
  trellis dump from the scan-based SC decoder for step-by-step A/B against
  the NumPy twin (the device fast path has no trellis — it is compared
  end-to-end instead).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax
import numpy as np


@dataclass
class Timer:
    """Named wall-clock spans with device fencing."""

    spans: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def total(self, name: str) -> float:
        return sum(self.spans.get(name, []))

    def mean(self, name: str) -> float:
        s = self.spans.get(name, [])
        return sum(s) / len(s) if s else 0.0

    def report(self) -> dict:
        return {name: {"total_s": self.total(name), "mean_s": self.mean(name),
                       "count": len(s)} for name, s in self.spans.items()}


@contextlib.contextmanager
def timed_span(name: str = "span", verbose: bool = True):
    """Simple fenced span: ``with timed_span("decode"): ...``"""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[{name}] {dt * 1e3:.2f} ms")


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/fec_trace"):
    """``jax.profiler`` trace context (view in TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclass
class DecodeRateCounter:
    """Decoded-bits/s(/chip) accumulator (SURVEY §5 "decoded-bits/s/chip
    counter")."""

    bits: int = 0
    seconds: float = 0.0
    chips: int = 1

    def add(self, frames: int, bits_per_frame: int, seconds: float) -> None:
        self.bits += frames * bits_per_frame
        self.seconds += seconds

    @property
    def mbps(self) -> float:
        return self.bits / self.seconds / 1e6 if self.seconds > 0 else 0.0

    @property
    def mbps_per_chip(self) -> float:
        return self.mbps / max(1, self.chips)


decode_rate_counter = DecodeRateCounter  # legacy alias


def trace_sc_trellis(llr: np.ndarray, frozen_mask: np.ndarray) -> dict:
    """Step-by-step SC trellis dump (reference
    ``debug_scripts/trace_llr_updates.py:22-87``).

    Runs the NumPy twin one leaf at a time and records the full L/B matrices
    after each decision — the ground-truth trace for debugging any device
    decoder discrepancy.
    """
    from ..models.polar.construction import bit_reverse
    from ..parity import polar_np

    llr = np.asarray(llr, np.float64)
    N = llr.size
    n = int(np.log2(N))
    L = np.full((N, n + 1), np.nan)
    B = np.full((N, n + 1), np.nan)
    L[:, 0] = llr
    steps = []
    for i in range(N):
        leaf = bit_reverse(i, n)
        polar_np._update_llrs(L, B, leaf, n, N)
        if frozen_mask[leaf]:
            B[leaf, n] = 0
        else:
            B[leaf, n] = 0 if L[leaf, n] >= 0 else 1
        polar_np._update_bits(B, leaf, n)
        steps.append({"step": i, "leaf": leaf,
                      "frozen": bool(frozen_mask[leaf]),
                      "decision_llr": float(L[leaf, n]),
                      "bit": int(B[leaf, n]),
                      "L": L.copy(), "B": B.copy()})
    return {"u": B[:, n].astype(np.int64), "steps": steps}
