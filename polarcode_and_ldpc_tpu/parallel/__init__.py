"""Device-mesh utilities for sharded Monte-Carlo (SURVEY §2.6).

The reference has no parallelism at all (single Python process,
``benchmarks/ber_simulation.py:167-192``); here frame data-parallelism over a
``jax.sharding.Mesh`` is a first-class component.
"""

from .mesh import (
    FRAME_AXIS,
    default_mesh,
    frame_sharding,
    multihost_mesh,
    pad_to_multiple,
    replicated_sharding,
)

__all__ = [
    "FRAME_AXIS",
    "default_mesh",
    "multihost_mesh",
    "frame_sharding",
    "replicated_sharding",
    "pad_to_multiple",
]
