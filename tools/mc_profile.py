"""Profile the end-to-end Monte-Carlo step's components on the device.

VERDICT r1 weak #1: the million-frame CA-SCL run achieved ~10–20% of
decode-only throughput.  This probe times, at several chunk sizes:

  (a) rng+encode+channel only (decode stubbed out)
  (b) decode only (LLRs staged on device)
  (c) the full pipeline step
  (d) the full step through MonteCarloSimulator.run (host loop + transfers)

Usage: python tools/mc_profile.py [--batches 1024,4096] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,4096")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=65536)
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder
    from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_polar_pipeline
    from polarcode_and_ldpc_tpu.sim.pipelines import make_montecarlo_step, _awgn_channel_fn
    from polarcode_and_ldpc_tpu.sim.throughput import _force

    N, K, L = 1024, 512, 8
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    fm = frozen_mask_from_positions(N, frozen)
    key = jax.random.PRNGKey(0)
    snr = jnp.float32(3.0)

    def steady(fn, *a, iters=5):
        for _ in range(2):
            _force(fn(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = fn(*a)
            _force(o)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    for B in [int(x) for x in args.batches.split(",")]:
        ids = jnp.arange(B, dtype=jnp.uint32)
        full = jax.jit(make_polar_pipeline(N, K, frozen, None,
                                           decoder="ca-scl", list_size=L))
        _log(f"B={B}: compiling full step ...")
        t0 = time.perf_counter()
        _force(full(key, ids, snr))
        t_full_compile = time.perf_counter() - t0
        t_full = steady(full, key, ids, snr)

        # (a) rng+encode+channel, decode stubbed
        from polarcode_and_ldpc_tpu.models.polar.encoder import polar_transform
        info_idx = jnp.asarray(info, jnp.int32)

        def _enc(msgs):
            u = jnp.zeros((*msgs.shape[:-1], N), jnp.int8)
            u = u.at[..., info_idx].set(msgs)
            return polar_transform(u)

        step_front = make_montecarlo_step(
            K, _enc, _awgn_channel_fn(None),
            lambda llr: (jnp.zeros((llr.shape[0], K), jnp.int8), {}))
        front = jax.jit(step_front)
        _force(front(key, ids, snr))
        t_front = steady(front, key, ids, snr)

        # (b) decode only, staged LLRs
        llr = jnp.asarray(np.random.default_rng(0)
                          .standard_normal((B, N)).astype(np.float32) * 4)
        dec = jax.jit(make_scl_decoder(N, fm, L, impl="scan-chunked"))
        _force(dec(llr))
        t_dec = steady(dec, llr)

        # (d) through the simulator (host loop, per-frame fetches)
        sim = MonteCarloSimulator(make_polar_pipeline(
            N, K, frozen, None, decoder="ca-scl", list_size=L), K - 8,
            chunk_frames=B)
        t0 = time.perf_counter()
        res = sim.run(args.frames, seed=1, extra_args=(snr,))
        t_sim = time.perf_counter() - t0

        print(f'{{"B": {B}, "full_compile_s": {t_full_compile:.1f}, '
              f'"front_s": {t_front:.4f}, "decode_s": {t_dec:.4f}, '
              f'"full_s": {t_full:.4f}, '
              f'"sim_frames_per_s": {res.frames / t_sim:.0f}, '
              f'"sim_mbps_info": {res.frames * (K - 8) / t_sim / 1e6:.1f}, '
              f'"decode_mbps": {B * K / t_dec / 1e6:.1f}}}', flush=True)


if __name__ == "__main__":
    main()
