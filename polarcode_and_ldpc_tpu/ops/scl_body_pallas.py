"""Pallas-fused SCL chunk bodies (SURVEY build plan step 5a).

The chunk-scan decoder (``models/polar/scanscl.py``) spends most of its
time inside the specialized subtree bodies — a few hundred XLA ops whose
intermediates round-trip HBM between fusion islands.  This module fuses
one whole body (the full size-S subtree decode: f/g recursion, rate-0
metric collapse, per-leaf stable top-L selection, lazy one-hot
re-indexing) into a single TPU kernel: the ``[L, S, B_tile]`` alpha block,
path metrics, and every intermediate stay VMEM-resident.

The kernel *body is the same jnp program* as the XLA path
(``scanscl._make_chunk_body``) — Pallas traces it against VMEM refs — so
outputs are bit-identical by construction and tested (interpret mode on
CPU, hardware vs XLA on TPU).

Layout notes: batch stays on the lane axis (tile ``B_tile = 128`` lanes);
the subtree width S on sublanes (f32 needs S·multiples of 8, int8 outputs
need S multiple of 32 — S ∈ {32, 64, 128, 256} all qualify); the grid
walks batch tiles.

STATUS (2026-08-17): bit-exact vs the XLA bodies in interpret mode
(``tests/test_scl_body_pallas.py``), but this session's remote-TPU
compile helper (chipless TpuAotCompiler over the axon tunnel) crashes
with an opaque ``tpu_compile_helper subprocess exit code 1`` on kernels
that feed an info-leaf's one-hot selection into downstream
multiply-reduce arithmetic — isolated by bisection to that composite
pattern (every constituent op compiles alone: the all-pairs rank needed
``lax.broadcasted_iota`` instead of broadcast ``arange``/``tril``
constants, now fixed; the residual crash reproduces with leaf → apply →
g at size 2 and yields no diagnostics).  On a locally attached TPU with
a normal Mosaic pipeline this path may simply work; until then the XLA
bodies (116.4 Mbps SCL-8 N=1024) remain the default and
``body_impl="pallas"`` is opt-in.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_chunk_body_pallas(flags: np.ndarray, Lsz: int, dtype,
                           batch_tile: int = 128, interpret: bool = False,
                           leaf_impl: str = "onehot"):
    """Pallas-fused equivalent of ``scanscl._make_chunk_body``.

    Returns ``body(alpha [L, S, B], pm [L, B]) → (beta [L, S, B] int8,
    pm [L, B], R [L, L, B])`` with B a multiple of ``batch_tile``.
    """
    from ..models.polar.scanscl import _make_chunk_body

    flags = np.asarray(flags, bool)
    S = len(flags)
    assert S % 32 == 0, "int8 beta output needs S multiple of 32"
    inner = _make_chunk_body(flags, Lsz, dtype, leaf_impl)

    def kernel(alpha_ref, pm_ref, beta_ref, pm_out_ref, r_ref):
        beta, pm, R = inner(alpha_ref[:], pm_ref[:])
        beta_ref[:] = beta
        pm_out_ref[:] = pm
        r_ref[:] = R

    def body(alpha, pm):
        B = alpha.shape[-1]
        assert B % batch_tile == 0, (B, batch_tile)
        grid = (B // batch_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Lsz, S, batch_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lsz, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Lsz, S, batch_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lsz, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lsz, Lsz, batch_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Lsz, S, B), jnp.int8),
                jax.ShapeDtypeStruct((Lsz, B), dtype),
                jax.ShapeDtypeStruct((Lsz, Lsz, B), dtype),
            ),
            interpret=interpret,
        )(alpha, pm)

    return body
