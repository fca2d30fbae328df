"""Million-frame Monte-Carlo runs on one chip → results/tpu/million_frame_run.json.

The flagship end-to-end demonstration (VERDICT r1 weak #1 / next-step #3):
CA-SCL-8 N=1024 @1 dB and LDPC BP n=504 @2 dB, one million frames each,
through the chunk-pipelined resumable simulator.  Round-1 ran at 2.4 /
3.3 Mbps end-to-end (chunk 512, unrolled decoder); round 2 uses the
chunk-scan decoder and large chunks.

Usage: python tools/million_frame_run.py [--frames 1000000]
       [--polar-chunk 8192] [--ldpc-chunk 16384] [--cpu] [--skip-ldpc]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = Path(__file__).resolve().parent.parent / "results" / "tpu"


def _log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1_000_000)
    ap.add_argument("--polar-chunk", type=int, default=8192)
    ap.add_argument("--ldpc-chunk", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-ldpc", action="store_true")
    ap.add_argument("--skip-polar", action="store_true")
    ap.add_argument("--scl-body", default="xla", choices=["xla", "pallas"],
                    help="SCL chunk-body implementation for the polar run")
    ap.add_argument("--scl-control", default="split",
                    choices=["split", "fused", "kernel", "unroll-kernel",
                             "mega"],
                    help="per-chunk control dispatch (fused wins with "
                    "pallas bodies, regresses xla ones; unroll-kernel "
                    "fuses each whole chunk step into one Pallas kernel)")
    ap.add_argument("--scl-chunk", type=int, default=128,
                    help="SCL decoder subtree chunk size (64 is the "
                    "measured flagship optimum for unroll-kernel)")
    ap.add_argument("--bp-impl", default="xla",
                    choices=["xla", "pallas", "auto"],
                    help="LDPC BP implementation (pallas = fused kernel "
                    "with per-tile early exit, 3.2x on v5e)")
    ap.add_argument("--ldpc-decoder", default="bp",
                    choices=["bp", "ms", "nms", "oms"],
                    help="LDPC message-passing rule (min-sum family rides "
                    "the same fused kernel via check_rule='ms')")
    ap.add_argument("--chunks-per-dispatch", type=int, default=1,
                    help="device chunks per host dispatch (amortizes the "
                    "remote-tunnel round-trip)")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.sim import (
        MonteCarloSimulator,
        make_ldpc_pipeline,
        make_polar_pipeline,
    )

    out = {"note": ("million-frame Monte-Carlo on one TPU v5e chip via the "
                    "chunk-pipelined simulator (frames keyed by global id; "
                    "resumable via accumulator checkpoints); round-2 "
                    "configuration: chunk-scan SCL decoder (Pallas fused "
                    "chunk bodies), tuned chunk sizes, runtime-SNR steps, "
                    "multi-chunk dispatches (tunnel round-trip "
                    "amortization)"),
           "device": str(jax.devices()[0])}

    if not args.skip_polar:
        N, K, L = 1024, 512, 8
        frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
        step = make_polar_pipeline(N, K, frozen, None, decoder="ca-scl",
                                   list_size=L, scl_body_impl=args.scl_body,
                                   scl_chunk=args.scl_chunk,
                                   scl_control_impl=args.scl_control)
        sim = MonteCarloSimulator(step, K - 8, chunk_frames=args.polar_chunk,
                                  chunks_per_dispatch=args.chunks_per_dispatch)
        _log(f"polar CA-SCL-8: {args.frames} frames @1 dB, "
             f"chunk {args.polar_chunk} (compiling) ...")
        t0 = time.perf_counter()
        sim.run(2 * args.polar_chunk, seed=0,
                extra_args=(jnp.float32(1.0),))  # warmup: compile + caches
        _log(f"polar: compile+warmup {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        res = sim.run(args.frames, seed=0, extra_args=(jnp.float32(1.0),))
        wall = time.perf_counter() - t0
        d = res.to_dict()
        d["wall_seconds_post_warmup"] = wall
        d["scl_body"] = args.scl_body
        d["scl_control"] = args.scl_control
        d["scl_chunk"] = args.scl_chunk
        d["chunks_per_dispatch"] = args.chunks_per_dispatch
        out["polar_cascl8_n1024_1db_1M"] = d
        _log(f"polar: {d['throughput_mbps']:.1f} Mbps end-to-end, "
             f"BER {d['ber']:.2e} FER {d['fer']:.2e}")

    if not args.skip_ldpc:
        enc = fec.LDPCEncoder(504, 252, dv=3, dc=6, seed=42)
        step = make_ldpc_pipeline(enc.H, enc.G, None,
                                  decoder=args.ldpc_decoder,
                                  max_iter=20,
                                  normalization=(0.75 if args.ldpc_decoder
                                                 == "nms" else 1.0),
                                  offset=(0.5 if args.ldpc_decoder == "oms"
                                          else 0.0),
                                  message_idx=enc.info_positions,
                                  bp_impl=args.bp_impl)
        sim = MonteCarloSimulator(step, enc.k, chunk_frames=args.ldpc_chunk,
                                  chunks_per_dispatch=args.chunks_per_dispatch)
        _log(f"ldpc {args.ldpc_decoder}: {args.frames} frames @2 dB, "
             f"chunk {args.ldpc_chunk} (compiling) ...")
        t0 = time.perf_counter()
        sim.run(2 * args.ldpc_chunk, seed=0, extra_args=(jnp.float32(2.0),))
        _log(f"ldpc: compile+warmup {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        res = sim.run(args.frames, seed=0, extra_args=(jnp.float32(2.0),))
        wall = time.perf_counter() - t0
        d = res.to_dict()
        d["wall_seconds_post_warmup"] = wall
        d["bp_impl"] = args.bp_impl
        out[f"ldpc_{args.ldpc_decoder}_n504_2db_1M"] = d
        _log(f"ldpc: {d['throughput_mbps']:.1f} Mbps end-to-end, "
             f"BER {d['ber']:.2e} FER {d['fer']:.2e}")

    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "million_frame_run.json"
    if path.exists():  # partial runs (--skip-*) refresh only their entries
        merged = json.loads(path.read_text())
        merged.update(out)
        out = merged
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
