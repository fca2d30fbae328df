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
CODE_AXIS = "code"


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


def mesh_2d(frame_devices: int, code_devices: int,
            devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``(frames, code)`` mesh: data parallelism over Monte-Carlo
    frames × model parallelism over the code dimension.

    The code axis shards the codeword (n) axis of large codes — for
    quasi-cyclic LDPC the per-block lane rotations on a sharded z axis
    lower to XLA collective-permutes that ride ICI (SURVEY §2.6 stretch:
    "sharding the n=8192 LDPC edge set ... across chips").
    """
    devices = list(devices) if devices is not None else jax.devices()
    assert frame_devices * code_devices == len(devices), (
        f"mesh {frame_devices}x{code_devices} != {len(devices)} devices")
    grid = np.asarray(devices).reshape(frame_devices, code_devices)
    return Mesh(grid, (FRAME_AXIS, CODE_AXIS))


def code_sharded_decode(decode, mesh: Mesh, frame_axis: str = FRAME_AXIS,
                        code_axis: str = CODE_AXIS):
    """Jit ``decode(llr [B, n]) → (bits [B, n], iters [B])`` with the batch
    sharded over ``frame_axis`` and the codeword axis over ``code_axis``.

    XLA's SPMD partitioner inserts the cross-shard communication (the QC
    decoder's ``jnp.roll`` lane rotations become collective-permutes; the
    per-frame syndrome all-reduce becomes a psum over the code axis).
    Outputs are bit-identical to the unsharded decoder — the partitioner
    only changes data placement, never arithmetic order.
    """
    in_s = NamedSharding(mesh, P(frame_axis, code_axis))
    out_s = (NamedSharding(mesh, P(frame_axis, code_axis)),
             NamedSharding(mesh, P(frame_axis)))
    return jax.jit(decode, in_shardings=in_s, out_shardings=out_s)


def code_sharded_polar_transform(mesh: Mesh, frame_axis: str = FRAME_AXIS,
                                 code_axis: str = CODE_AXIS):
    """Polar butterfly ``u [B, N] → x = u·G_N`` with the CODE axis sharded
    across chips — the polar counterpart of the QC-LDPC 2-D mesh story
    (SURVEY §2.6 stretch: sharding within a frame).

    The butterfly's stage-s XORs pair positions ``j`` and ``j + 2^s``:
    stages with ``2^s <`` the shard width are shard-local; wider stages
    pair elements living on different chips, which XLA's SPMD partitioner
    lowers to ICI collective-permutes of the upper halves.  Unlike the SC
    *decoder* (serial over leaves — frames stay the only useful polar
    decode parallelism), the ENCODE butterfly is fully parallel, so
    within-frame sharding composes cleanly with frame data-parallelism
    for codes too wide for one chip's share of HBM.  Outputs are
    bit-identical to the unsharded transform (placement only).

    Returns ``transform(u [B, N] int8) → x [B, N] int8`` jitted with
    (frames, code) shardings on input and output.
    """
    from ..models.polar.encoder import polar_transform

    in_s = NamedSharding(mesh, P(frame_axis, code_axis))
    return jax.jit(polar_transform, in_shardings=in_s, out_shardings=in_s)


def pad_to_multiple(n: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` that is ≥ n."""
    return ((n + multiple - 1) // multiple) * multiple
