"""SNR sweeps producing reference-schema result dicts
(reference ``benchmarks/ber_simulation.py:24-129`` and
``benchmarks/test_snr_curves.py:25-163``).

The reference constructs one channel per SNR point
(``ber_simulation.py:157-165``); round 1 inherited that shape as one XLA
compile per point (~100 s each for SCL-8 N=1024).  Runtime-SNR pipelines
(``pipelines.make_*_pipeline(snr_db=None)``) remove it: the sweep builds
ONE simulator and passes each SNR as a traced scalar, so the whole curve
costs a single compile.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from .montecarlo import MonteCarloResult, MonteCarloSimulator


def run_snr_sweep(
    pipeline_builder: Callable[[Optional[float]], Callable],
    bits_per_frame: int,
    snr_points: Sequence[float],
    num_frames: int = 1000,
    max_errors: Optional[int] = 100,
    seed: int = 42,
    chunk_frames: int = 512,
    mesh=None,
    verbose: bool = False,
    chunks_per_dispatch: int = 1,
) -> dict:
    """Run one Monte-Carlo simulation per SNR point.

    Args:
        pipeline_builder: ``snr_db → step_fn`` (see ``sim.pipelines``).  It
            is first called with ``None``; if the returned step advertises
            ``runtime_snr`` (default AWGN / fading channels), one jitted
            program serves every point, with ``snr_db`` passed as a traced
            scalar.  Otherwise (custom baked channels, or builders that
            require a concrete SNR) the sweep falls back to one program per
            point, exactly as the reference constructs one channel per
            point (``ber_simulation.py:157-165``).

    Returns the reference's per-curve schema (``ber_simulation.py:195-205``):
    ``{"snr_db": [...], "ber": [...], "fer": [...], "frames_tested": [...],
    "avg_iterations": [...], "elapsed_seconds": [...],
    "throughput_mbps": [...]}``.
    """
    shared_sim = None
    try:
        step = pipeline_builder(None)
        if getattr(step, "runtime_snr", False):
            shared_sim = MonteCarloSimulator(
                step, bits_per_frame, chunk_frames=chunk_frames, mesh=mesh,
                chunks_per_dispatch=chunks_per_dispatch)
    except Exception:
        shared_sim = None  # builder needs a concrete SNR → per-point path

    out = {"snr_db": [], "ber": [], "fer": [], "frames_tested": [],
           "bit_errors": [], "frame_errors": [], "avg_iterations": [],
           "elapsed_seconds": [], "throughput_mbps": []}
    for snr_db in snr_points:
        if shared_sim is not None:
            res: MonteCarloResult = shared_sim.run(
                num_frames, max_errors=max_errors, seed=seed,
                extra_args=(jnp.float32(snr_db),))
        else:
            sim = MonteCarloSimulator(
                pipeline_builder(snr_db), bits_per_frame,
                chunk_frames=chunk_frames, mesh=mesh,
                chunks_per_dispatch=chunks_per_dispatch)
            res = sim.run(num_frames, max_errors=max_errors, seed=seed)
        out["snr_db"].append(float(snr_db))
        out["ber"].append(res.ber)
        out["fer"].append(res.fer)
        out["frames_tested"].append(res.frames)
        out["bit_errors"].append(res.bit_errors)
        out["frame_errors"].append(res.frame_errors)
        out["avg_iterations"].append(res.avg_iterations)
        out["elapsed_seconds"].append(res.elapsed_seconds)
        out["throughput_mbps"].append(res.throughput_mbps)
        if verbose:
            print(f"  SNR {snr_db:+.2f} dB: BER {res.ber:.3e}  FER {res.fer:.3e}  "
                  f"frames {res.frames}  {res.throughput_mbps:.3f} Mbps")
    return out
