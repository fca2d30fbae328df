"""A/B the Monte-Carlo host-loop reductions on the device.

mc_profile.py showed the jitted MC step costs ~41 ms/chunk (B=8192) but
the simulator loop spends ~64 ms/chunk: the per-frame result fetch
(3 × [B] arrays over the remote tunnel) serializes with compute.
``reduction="scalar"`` ships 3 int64 scalars instead (exact early-stop
accounting via the on-device crossing trim), so it should recover most of
the gap.  This probe times both modes for the flagship polar CA-SCL-8 and
LDPC BP pipelines and checks the counters agree.

Usage: python tools/mc_reduction_ab.py [--frames 262144] [--cpu]
       [--scl-body xla|pallas] [--skip-ldpc]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=262144)
    ap.add_argument("--polar-chunk", type=int, default=8192)
    ap.add_argument("--ldpc-chunk", type=int, default=16384)
    ap.add_argument("--scl-body", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-ldpc", action="store_true")
    ap.add_argument("--skip-polar", action="store_true")
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

    def ab(name, make_step, k_bits, chunk, snr):
        rows = {}
        for red in ("per_frame", "scalar"):
            sim = MonteCarloSimulator(make_step(), k_bits, chunk_frames=chunk,
                                      reduction=red)
            t0 = time.perf_counter()
            sim.run(2 * chunk, seed=0, extra_args=(jnp.float32(snr),))
            _log(f"{name}/{red}: compile+warmup {time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
            res = sim.run(args.frames, seed=0, extra_args=(jnp.float32(snr),))
            wall = time.perf_counter() - t0
            mbps = res.frames * k_bits / wall / 1e6
            rows[red] = (res, mbps)
            print(f'{{"pipeline": "{name}", "reduction": "{red}", '
                  f'"chunk": {chunk}, "frames": {res.frames}, '
                  f'"bit_errors": {res.bit_errors}, '
                  f'"frame_errors": {res.frame_errors}, '
                  f'"mbps_info": {mbps:.1f}}}', flush=True)
        a, b = rows["per_frame"][0], rows["scalar"][0]
        assert (a.frames, a.bit_errors, a.frame_errors) == \
            (b.frames, b.bit_errors, b.frame_errors), "reductions disagree"
        _log(f"{name}: counters match across reductions")

    if not args.skip_polar:
        N, K, L = 1024, 512, 8
        frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
        ab("polar_cascl8",
           lambda: make_polar_pipeline(N, K, frozen, None, decoder="ca-scl",
                                       list_size=L,
                                       scl_body_impl=args.scl_body),
           K - 8, args.polar_chunk, 1.0)

    if not args.skip_ldpc:
        enc = fec.LDPCEncoder(504, 252, dv=3, dc=6, seed=42)
        ab("ldpc_bp",
           lambda: make_ldpc_pipeline(enc.H, enc.G, None, decoder="bp",
                                      max_iter=20,
                                      message_idx=enc.info_positions),
           enc.k, args.ldpc_chunk, 2.0)


if __name__ == "__main__":
    main()
