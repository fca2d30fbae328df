#!/usr/bin/env python
"""Retry the Pallas SCL chunk-body compile on the real TPU.

Last session's remote AOT compile helper crashed (opaque exit 1) on the
leaf-selection → arithmetic composite (see ops/scl_body_pallas.py
docstring).  This probe retries in a fresh session: first the smallest
failing composite, then a full small decoder, then (if both pass) the
flagship config A/B vs the XLA bodies.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    from polarcode_and_ldpc_tpu.models.polar.construction import (
        construct_polar_code, frozen_mask_from_positions)
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan
    from polarcode_and_ldpc_tpu.ops.scl_body_pallas import make_chunk_body_pallas

    rng = np.random.default_rng(0)

    # stage 1: one fused body, S=32, mixed frozen/info pattern
    S, L, B = 32, 4, 256
    flags = np.zeros(S, bool)
    flags[: S // 2] = True
    body = make_chunk_body_pallas(flags, L, jnp.float32)
    alpha = jnp.asarray(rng.standard_normal((L, S, B)), jnp.float32)
    pm = jnp.full((L, B), -1e30, jnp.float32).at[0].set(0.0)
    t0 = time.time()
    try:
        beta, pm_o, R = jax.jit(body)(alpha, pm)
        beta.block_until_ready()
        print(f"stage1 body compile+run OK in {time.time()-t0:.1f}s "
              f"(beta sum {int(np.asarray(beta).sum())})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"stage1 FAILED after {time.time()-t0:.1f}s: {e!r}", flush=True)
        return 1

    # stage 2: full small decoder, pallas vs xla bodies, same inputs
    N, K, L = 256, 128, 8
    frozen, _ = construct_polar_code(N, K)
    mask = frozen_mask_from_positions(N, frozen)
    llr = rng.standard_normal((512, N)).astype(np.float32) * 2.0
    outs = {}
    for impl in ("xla", "pallas"):
        dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=64,
                                            body_impl=impl))
        t0 = time.time()
        u, m = dec(llr)
        u.block_until_ready()
        outs[impl] = (np.asarray(u), np.asarray(m))
        print(f"stage2 {impl}: compile+run {time.time()-t0:.1f}s", flush=True)
    ok = (outs["xla"][0] == outs["pallas"][0]).all() and np.allclose(
        outs["xla"][1], outs["pallas"][1])
    print(f"stage2 bit-exact match: {ok}", flush=True)
    if not ok:
        return 1

    # stage 3: flagship config timing A/B
    N, K, L, Bsz = 1024, 512, 8, 8192
    frozen, _ = construct_polar_code(N, K)
    mask = frozen_mask_from_positions(N, frozen)
    llr = rng.standard_normal((Bsz, N)).astype(np.float32) * 2.0
    for impl in ("pallas", "xla"):
        dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=128,
                                            body_impl=impl))
        t0 = time.time()
        u, m = dec(llr)
        np.asarray(m)[0, 0]
        print(f"stage3 {impl}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = 1e30
        for _ in range(5):
            t0 = time.time()
            u, m = dec(llr)
            np.asarray(m)[0, 0]
            best = min(best, time.time() - t0)
        print(f"stage3 {impl}: steady {best*1e3:.1f} ms "
              f"→ {Bsz*K/best/1e6:.1f} Mbps", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
