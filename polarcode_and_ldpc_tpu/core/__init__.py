"""Core substrate: configuration dataclasses, RNG key discipline, dtype policy."""

from .config import (
    PolarCodeConfig,
    LDPCCodeConfig,
    ChannelConfig,
    SimulationConfig,
    load_yaml_config,
)
from .rng import frame_keys, split_key

__all__ = [
    "PolarCodeConfig",
    "LDPCCodeConfig",
    "ChannelConfig",
    "SimulationConfig",
    "load_yaml_config",
    "frame_keys",
    "split_key",
]
