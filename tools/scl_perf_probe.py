"""Probe compile + steady-state decode time for SCL implementations.

Usage: python tools/scl_perf_probe.py [--impl scan-chunked] [--batch 4096]
       [--N 1024] [--K 512] [--L 8] [--chunk 64] [--cpu]

Prints one line per configuration: compile seconds, steady seconds/batch,
decoded info Mbps.  Inputs are staged host-side (the remote-TPU tunnel makes
extra compiles expensive — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="scan-chunked")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--K", type=int, default=512)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--body", default="xla")
    ap.add_argument("--leaf", default="onehot", choices=["onehot", "sort"])
    ap.add_argument("--control", default="split",
                    choices=["split", "fused", "kernel", "unroll-fused",
                             "unroll-kernel", "mega"])
    ap.add_argument("--batch-tile", type=int, default=128,
                    help="Pallas superkernel batch tile (kernel modes)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np
    from polarcode_and_ldpc_tpu.sim.throughput import _force

    N, K, L, B = args.N, args.K, args.L, args.batch
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    fm = frozen_mask_from_positions(N, frozen)
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, (B, K)).astype(np.int8)
    u = np.zeros((B, N), np.int64)
    u[:, info] = msgs
    s = 1
    while s < N:
        u = u.reshape(B, N // (2 * s), 2, s)
        u[:, :, 0, :] ^= u[:, :, 1, :]
        u = u.reshape(B, N)
        s *= 2
    llr = awgn_llr_np(u, 3.0, rng.standard_normal((B, N))).astype(np.float32)

    import jax.numpy as jnp

    llr_dev = jnp.asarray(llr)
    print(f"device={jax.devices()[0]} impl={args.impl} N={N} K={K} L={L} "
          f"B={B} chunk={args.chunk} body={args.body} leaf={args.leaf}",
          file=sys.stderr, flush=True)
    dec = jax.jit(make_scl_decoder(N, fm, L, impl=args.impl,
                                   chunk=args.chunk, body_impl=args.body,
                                   leaf_impl=args.leaf,
                                   control_impl=args.control,
                                   batch_tile=args.batch_tile))
    t0 = time.perf_counter()
    out = dec(llr_dev)
    _force(out)
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = dec(llr_dev)
        _force(o)
        best = min(best, (time.perf_counter() - t0) / args.iters)
    u_np, m_np = np.asarray(out[0]), np.asarray(out[1])
    bestp = u_np[np.arange(B), np.argmax(m_np, axis=1)][:, info]
    ber = float((bestp != msgs).mean())
    mbps = B * K / best / 1e6
    print(f"{{\"impl\": \"{args.impl}\", \"N\": {N}, \"L\": {L}, \"batch\": {B}, "
          f"\"chunk\": {args.chunk}, \"compile_s\": {t_compile:.1f}, "
          f"\"steady_s\": {best:.4f}, \"mbps\": {mbps:.1f}, \"ber\": {ber:.2e}}}",
          flush=True)


if __name__ == "__main__":
    main()
