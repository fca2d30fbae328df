"""Frame-throughput scaling study (BASELINE.json north star:
"decoded-bits/s scaling efficiency measured at 1 chip, 1 host, N≥2 hosts").

On real pods this runs over `jax.distributed`; in CI it runs on the
virtual CPU mesh (``--xla_force_host_platform_device_count``).  Scaling is
measured by timing the same Monte-Carlo step on meshes of 1, 2, 4, …
devices with the per-device frame count held constant (weak scaling — the
relevant regime for Monte-Carlo, where total frames grow with the fleet).
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..parallel.mesh import default_mesh, frame_sharding


def measure_scaling(
    step_fn: Callable,
    frames_per_device: int = 256,
    device_counts: Optional[Sequence[int]] = None,
    iters: int = 5,
    warmup: int = 2,
) -> dict:
    """Weak-scaling sweep over sub-meshes of the visible devices.

    Returns per-size wall time, frames/s, and parallel efficiency relative
    to the single-device run.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    jitted = jax.jit(step_fn)
    key = jax.random.PRNGKey(0)
    out: dict = {"frames_per_device": frames_per_device, "points": []}
    base_rate = None
    for nd in device_counts:
        mesh = default_mesh(devices[:nd])
        sharding = frame_sharding(mesh)
        batch = frames_per_device * nd
        ids = jax.device_put(jnp.arange(batch, dtype=jnp.uint32), sharding)
        for _ in range(warmup):
            jax.block_until_ready(jitted(key, ids))
        t0 = time.perf_counter()
        res = None
        for _ in range(iters):
            res = jitted(key, ids)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / iters
        rate = batch / dt
        if base_rate is None:
            base_rate = rate
        out["points"].append({
            "devices": nd,
            "batch": batch,
            "seconds": dt,
            "frames_per_second": rate,
            "speedup": rate / (base_rate / device_counts[0]),
            "efficiency": rate / (base_rate * nd / device_counts[0]),
        })
    return out
