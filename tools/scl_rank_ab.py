#!/usr/bin/env python
"""A/B the rank-vector list algebra (perm_impl="rank") vs the one-hot
algebra on the real TPU — hardware bit-exactness first, then throughput
at the flagship bench shape.

Round-3 change under test (VERDICT r2 top item): pendings/permutations as
int32 rank vectors [L, B] instead of one-hot [L, L, B] — composes go from
O(L³·B) multiply-adds to O(L²·B) selects, applies become pure select
chains (no casts, no multiply+add), and the superkernel pend VMEM term
shrinks by L×.

Usage:
  python tools/scl_rank_ab.py --stage exact    # hardware bit-match probe
  python tools/scl_rank_ab.py --stage perf     # rank at the bench shape
  python tools/scl_rank_ab.py --stage both
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def stage_exact() -> bool:
    """Decode one batch with both algebras on hardware; outputs must be
    bit-identical (they are pure selections with identical ordering)."""
    import numpy as np
    import jax

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder

    import bench

    N, K, L = 1024, 512, 8
    frozen, info_bits = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    fm = frozen_mask_from_positions(N, frozen)
    msgs = np.random.default_rng(7).integers(0, 2, (256, K)).astype(np.int8)
    cw = bench._polar_encode_host(msgs, N, info_bits)
    llr = bench._awgn_llrs_host(cw, 3.0, seed=9)
    outs = {}
    for perm in ("onehot", "rank"):
        t0 = time.time()
        dec = jax.jit(make_scl_decoder(
            N, fm, L, impl="scan-chunked", chunk=64,
            control_impl="unroll-kernel", perm_impl=perm))
        u, m = jax.block_until_ready(dec(llr))
        outs[perm] = (np.asarray(u), np.asarray(m))
        print(f"exact[{perm}]: compile+run {time.time()-t0:.0f}s",
              flush=True)
    u_match = bool((outs["onehot"][0] == outs["rank"][0]).all())
    m_match = bool((outs["onehot"][1] == outs["rank"][1]).all())
    print(f"exact: u match={u_match} metrics match={m_match}", flush=True)
    return u_match and m_match


def stage_perf(batch: int, scan: int, chunk: int, control: str) -> dict:
    import bench

    res = {}
    for perm in ("rank",):  # onehot baseline known: 246.4 (BENCH_r02)
        t0 = time.time()
        r = bench.bench_polar_scl8(batch=batch, control_impl=control,
                                   chunk=chunk, scan_chunks=scan,
                                   perm_impl=perm)
        res[perm] = r["mbps"]
        print(f"perf[{perm}] {batch}x{scan} chunk{chunk} {control}: "
              f"{r['mbps']:.1f} Mbps (BER {r['ber_3db']:.2e}, "
              f"total {time.time()-t0:.0f}s)", flush=True)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both",
                    choices=["exact", "perf", "both"])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--scan", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--control", default="unroll-kernel")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    result = {}
    if args.stage in ("exact", "both"):
        result["hardware_bit_match"] = stage_exact()
    if args.stage in ("perf", "both"):
        result.update(stage_perf(args.batch, args.scan, args.chunk,
                                 args.control))
    print(json.dumps(result), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
