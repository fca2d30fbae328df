"""Whole-decode SCL megakernel — the entire chunk program in ONE TPU kernel.

The chunk-step superkernels (``scl_superchunk_pallas.py``) already fuse
each (descend, body, ascend) triple, but a flagship decode still launches
~17 of them, and every launch round-trips the full level-stack state
(alphas, betas, pendings — ~5 MB per 128-lane batch tile) through HBM.
With the whole program fused the state never leaves the core: it is pure
dataflow between chunk steps, so per-tile HBM I/O collapses to the channel
LLRs in (``[N, B_tile]`` f32) and the root beta plane + final metrics out
(``[L, N, B_tile]`` int8 + ``[L, B_tile]`` f32) — ~25x less traffic and
one launch instead of seventeen.

The kernel body is the *same jnp program* as the fused-control XLA path:
``scanscl._make_super_fn`` / ``_make_last_fn`` traced in schedule order
against the kernel-safe one-hot algebra (static loops + explicit row
replication — Mosaic rejects broadcast 3D forms), so outputs are
bit-identical to every other control mode by construction (interpret-mode
tests enforce on CPU; A/B tools on hardware).

VMEM budget: the live set is the level stacks (~4-6 MB at flagship
N=1024 L=8 chunk=64, 128-lane tiles) plus Mosaic temporaries; the
``mega_vmem_bytes`` estimate gates callers — configs that do not fit
should use the hybrid per-chunk kernel mode instead.

Reference semantics: /root/reference/src/polar/decoder.py:176-444 (SCL);
the chunked schedule and one-hot list algebra are this framework's own
TPU-first design (see models/polar/scanscl.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.polar.scanscl import (
    _make_chunk_body,
    _make_last_fn,
    _make_super_fn,
    pend_liveness,
)
from .scl_body_pallas import _LOOP_ALGEBRA, _identity_r_loop
from .scl_superchunk_pallas import _SUPER_ALGEBRA


def mega_vmem_bytes(t: int, sizes, Lsz: int, dtype,
                    batch_tile: int = 128) -> int:
    """Estimated peak VMEM residency of the whole-decode kernel at one
    batch tile: persistent dataflow state (llr + level stacks + pendings +
    metrics + root output) plus a working-set allowance for the chunk-body
    temporaries (~4x the level-t alpha block covers the f/g recursion and
    the one-hot leaf products)."""
    fsz = jnp.dtype(dtype).itemsize
    N = sizes[0]
    total = N * batch_tile * fsz                       # llr
    for l in range(1, t + 1):
        total += Lsz * sizes[l] * batch_tile * fsz     # alpha
        total += Lsz * sizes[l] * batch_tile           # beta int8
    total += 2 * t * Lsz * Lsz * batch_tile * fsz      # pend_a + pend_b
    total += Lsz * batch_tile * fsz                    # pm
    total += Lsz * N * batch_tile                      # root int8 out
    total += 4 * Lsz * sizes[t] * batch_tile * fsz     # body working set
    return total


#: VMEM residency gate (v5e ~16 MB/core; leave room for Mosaic spills)
MEGA_VMEM_BUDGET = 12 * 1024 * 1024


def make_scl_mega_pallas(chunk_flags: np.ndarray, desc_k: np.ndarray,
                         asc_j: np.ndarray, t: int, sizes, Lsz: int, dtype,
                         leaf_impl: str = "onehot", batch_tile: int = 128,
                         interpret: bool = False):
    """Build the whole-decode megakernel.

    ``chunk_flags [C, S]`` are the per-chunk frozen patterns in schedule
    (bit-reversed storage) order; ``desc_k`` / ``asc_j`` the per-chunk
    descend selectors and ascend counts (``scanscl`` schedule).  Returns
    ``core(llr_nb [N, B]) -> (root [L, N, B] int8, pm [L, B])`` for B a
    multiple of ``batch_tile`` (callers guard smaller batches with the
    bit-identical XLA program).
    """
    chunk_flags = np.asarray(chunk_flags, bool)
    C, S = chunk_flags.shape
    N = sizes[0]
    assert C >= 2 and S * C == N

    # one specialized body per unique pattern, kernel-safe algebra
    unique: dict[bytes, int] = {}
    bodies = []
    pattern_ids = np.zeros(C, np.int32)
    for c in range(C):
        key = chunk_flags[c].tobytes()
        if key not in unique:
            unique[key] = len(bodies)
            bodies.append(_make_chunk_body(chunk_flags[c], Lsz, dtype,
                                           leaf_impl, algebra=_LOOP_ALGEBRA))
        pattern_ids[c] = unique[key]

    comp_a, comp_b = pend_liveness(desc_k, asc_j, t, C)
    step_fns = [
        _make_super_fn(int(desc_k[c]), int(asc_j[c]), t, sizes, Lsz, dtype,
                       bodies[pattern_ids[c]], algebra=_SUPER_ALGEBRA,
                       compose_a=comp_a[c], compose_b=comp_b[c])
        for c in range(C - 1)
    ]
    last_fn = _make_last_fn(t, sizes, Lsz, dtype, bodies[pattern_ids[C - 1]],
                            algebra=_SUPER_ALGEBRA)

    def kernel(llr_ref, root_ref, pm_ref):
        llr = llr_ref[:]
        batch = llr.shape[-1]
        eye = _identity_r_loop(Lsz, batch, dtype)
        # same init as the scan carry (zeros are never read before a write
        # per the schedule; pendings start as identity)
        alpha = tuple(jnp.zeros((Lsz, sizes[l], batch), dtype)
                      for l in range(1, t + 1))
        beta = tuple(jnp.zeros((Lsz, sizes[l], batch), jnp.int8)
                     for l in range(1, t + 1))
        pend_a = tuple(eye for _ in range(t))
        pend_b = tuple(eye for _ in range(t))
        row = jax.lax.broadcasted_iota(jnp.int32, (Lsz, batch), 0)
        pm = jnp.where(row == 0, jnp.zeros((), dtype),
                       jnp.full((), -jnp.inf, dtype))
        for fn in step_fns:
            alpha, pend_a, beta, pend_b, pm = fn(
                llr, alpha, pend_a, beta, pend_b, pm)
        root, pm = last_fn(llr, alpha, pend_a, beta, pend_b, pm)
        root_ref[:] = root
        pm_ref[:] = pm

    def core(llr_nb):
        B = llr_nb.shape[-1]
        assert B % batch_tile == 0, (B, batch_tile)
        return pl.pallas_call(
            kernel,
            grid=(B // batch_tile,),
            in_specs=[pl.BlockSpec((N, batch_tile), lambda b: (0, b),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((Lsz, N, batch_tile), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lsz, batch_tile), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Lsz, N, B), jnp.int8),
                jax.ShapeDtypeStruct((Lsz, B), dtype),
            ),
            interpret=interpret,
        )(llr_nb)

    return core
