"""RNG key discipline.

The reference seeds NumPy's *global* RNG (``src/channel/awgn.py:34-35``,
``benchmarks/benchmark_scl.py:38``), which is fragile and not reproducible
under parallel execution.  Here every random quantity is derived from an
explicit ``jax.random`` key; per-frame keys are derived from the *global
frame id* so that results are independent of batch size, chunking, and
sharding layout (SURVEY §7 "multi-host determinism").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_key(key, num: int):
    return jax.random.split(key, num)


def frame_keys(root_key, global_frame_ids):
    """Derive one key per frame from its global frame id.

    ``fold_in`` guarantees the key for frame *i* is the same regardless of
    which chunk/batch/shard the frame lands in.
    """
    return jax.vmap(lambda i: jax.random.fold_in(root_key, i))(
        jnp.asarray(global_frame_ids, dtype=jnp.uint32)
    )
