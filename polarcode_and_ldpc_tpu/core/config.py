"""Unified configuration layer.

The reference scatters configuration across two YAML files
(``config/polar_config.yaml``, ``config/ldpc_config.yaml`` — loaded at
``benchmarks/run_benchmark.py:25-28``) and per-script argparse / hard-coded
dicts (``benchmarks/test_snr_curves.py:414-424``).  Here a single dataclass
layer backs every CLI: YAML provides defaults, CLI flags override.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Optional


@dataclass
class PolarCodeConfig:
    """Polar code parameters (reference: ``config/polar_config.yaml``)."""

    N: int = 1024
    K: int = 512
    use_crc: bool = False
    crc_polynomial: str = "CRC-8"
    construction: str = "bhattacharyya"  # bhattacharyya | gaussian_approximation | dega | default
    design_snr_db: float = 2.0
    # decoding
    algorithm: str = "sc"  # sc | scl | ca_scl
    list_size: int = 8
    # TPU fast-path knobs (bit-identical outputs in every combination;
    # see models/polar/scanscl.py — "unroll-kernel" + chunk 128 with the
    # rank list algebra is the measured flagship optimum on v5e)
    scl_body_impl: str = "xla"       # xla | pallas
    scl_chunk: int = 128
    scl_control_impl: str = "split"  # split | fused | kernel | unroll-* | mega
    # "fast" enables the SSCL fast list nodes — APPROXIMATE (error rates
    # statistically match exact SCL; outputs are not bit-identical to it);
    # see models/polar/scanscl.py
    scl_node_mode: str = "exact"     # exact | fast

    def __post_init__(self):
        assert self.N > 0 and (self.N & (self.N - 1)) == 0, "N must be a power of 2"
        assert 0 < self.K < self.N, "K must be in (0, N)"

    @property
    def rate(self) -> float:
        return self.K / self.N


@dataclass
class LDPCCodeConfig:
    """LDPC code parameters (reference: ``config/ldpc_config.yaml``)."""

    n: int = 504
    k: int = 252
    dv: int = 3
    dc: int = 6
    construction: str = "regular"  # regular | mackay | peg | random | qc
    seed: Optional[int] = 42
    # decoding
    algorithm: str = "bp"  # bp | min_sum | nms | oms
    max_iterations: int = 20
    early_stop: bool = True
    normalization: float = 0.75
    offset: float = 0.5
    # TPU fast path (bit-identical incl. iteration counts): "auto" uses
    # the fused Pallas BP kernel with per-tile early exit when available
    # (measured 731 vs 231 Mbps at n=504 on v5e)
    bp_impl: str = "xla"  # xla | pallas | auto

    def __post_init__(self):
        assert self.n > self.k > 0, "need n > k > 0"

    @property
    def rate(self) -> float:
        return self.k / self.n


@dataclass
class ChannelConfig:
    kind: str = "awgn"  # awgn | bsc | rayleigh | rician
    snr_db: float = 3.0
    crossover_prob: float = 0.1  # BSC only
    k_factor: float = 1.0  # Rician only


@dataclass
class SimulationConfig:
    """Monte-Carlo sweep parameters (reference CLI flags at
    ``benchmarks/run_benchmark.py:42-66``)."""

    snr_start: float = -2.0
    snr_stop: float = 6.0
    snr_step: float = 0.5
    num_frames: int = 1000
    max_errors: int = 100
    batch_size: int = 256  # device-side frames per chunk (new: frames are batched)
    chunks_per_dispatch: int = 1  # device chunks per host dispatch (tunnel
    #                               round-trip amortization; exact accounting
    #                               is preserved — see sim/montecarlo.py)
    seed: int = 42
    output_dir: str = "results"

    def snr_points(self) -> list[float]:
        pts = []
        snr = self.snr_start
        # inclusive endpoint, matching np.arange(start, stop + step/2, step)
        while snr <= self.snr_stop + 1e-9:
            pts.append(round(snr, 6))
            snr += self.snr_step
        return pts

    @classmethod
    def from_range_string(cls, spec: str, **kw) -> "SimulationConfig":
        """Parse ``start:stop:step`` (reference ``run_benchmark.py:31-38``)."""
        start, stop, step = (float(x) for x in spec.split(":"))
        return cls(snr_start=start, snr_stop=stop, snr_step=step, **kw)


def _coerce_fields(cls, raw: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in raw.items() if k in names}


def load_yaml_config(path: str | Path, cls=None):
    """Load a YAML file; optionally coerce into a config dataclass.

    Accepts both this framework's flat schema and the reference's nested
    schema (``code_params`` / ``decoding`` / ``construction`` sections in
    ``config/polar_config.yaml``).
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if cls is None:
        return raw
    flat: dict = {}
    for key, val in raw.items():
        if isinstance(val, dict):
            flat.update(val)
        else:
            flat[key] = val
    # reference naming shims
    if "list_size" not in flat and "L" in flat:
        flat["list_size"] = flat["L"]
    if "construction" not in flat and "method" in flat:
        flat["construction"] = flat["method"]
    return cls(**_coerce_fields(cls, flat))
