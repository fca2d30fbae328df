"""Device-mesh utilities for sharded Monte-Carlo (SURVEY §2.6).

The reference has no parallelism at all (single Python process,
``benchmarks/ber_simulation.py:167-192``); here frame data-parallelism over a
``jax.sharding.Mesh`` is a first-class component.
"""

from .mesh import (
    CODE_AXIS,
    FRAME_AXIS,
    code_sharded_decode,
    code_sharded_polar_transform,
    default_mesh,
    frame_sharding,
    mesh_2d,
    multihost_mesh,
    pad_to_multiple,
    replicated_sharding,
)

__all__ = [
    "CODE_AXIS",
    "FRAME_AXIS",
    "code_sharded_decode",
    "code_sharded_polar_transform",
    "default_mesh",
    "mesh_2d",
    "multihost_mesh",
    "frame_sharding",
    "replicated_sharding",
    "pad_to_multiple",
]
