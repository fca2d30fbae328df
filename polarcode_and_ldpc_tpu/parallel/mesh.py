"""Mesh construction and frame sharding.

Monte-Carlo FEC simulation is embarrassingly parallel over frames: the only
communication is the final error-count reduction.  The idiomatic TPU design
is therefore a 1-D ``('frames',)`` mesh spanning all chips (ICI within a
slice, DCN across hosts), frames sharded along the leading axis, and XLA
inserting the ``psum`` for the scalar reductions automatically under ``jit``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAME_AXIS = "frames"


def default_mesh(devices: Optional[Sequence] = None, axis_name: str = FRAME_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def multihost_mesh(axis_name: str = FRAME_AXIS) -> Mesh:
    """Mesh over every device in a multi-host run.

    Call ``jax.distributed.initialize()`` first on pods; ``jax.devices()``
    then enumerates the global device set.
    """
    return default_mesh(jax.devices(), axis_name)


def frame_sharding(mesh: Mesh, axis_name: str = FRAME_AXIS) -> NamedSharding:
    """Shard the leading (frame) axis; all other axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` that is ≥ n."""
    return ((n + multiple - 1) // multiple) * multiple
