"""Measure the SSCL fast-node SCL decoder (``node_mode="fast"``) on TPU.

Reuses the driver bench's chained-scan harness (``bench.bench_polar_scl8``)
so numbers are directly comparable to the exact-mode lines in
``results/tpu/bench_v5e.json``: same flagship config (SCL-8 N=1024 K=512,
AWGN 3 dB), same on-device BER counting, same forced-completion timing.

Correctness rides inside every timed run: the chained program counts decoded
info-bit errors on device, so the reported BER@3dB must land on the exact
decoder's value (~1e-5 at this config) for the number to be valid.

Usage:  python -u tools/fast_nodes_tpu_probe.py [--shapes 8192x16,4096x32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="8192x16,4096x32",
                    help="comma list of batch x scan_chunks")
    ap.add_argument("--control", default="unroll-fused")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--exact-baseline", action="store_true",
                    help="also time node_mode='exact' at the first shape")
    ap.add_argument("--out", default="results/tpu/fast_nodes_probe.json")
    args = ap.parse_args()

    from bench import bench_polar_scl8

    results = {"config": vars(args), "runs": []}
    for shape in args.shapes.split(","):
        batch, chunks = (int(x) for x in shape.split("x"))
        for node_mode in (["fast", "exact"] if args.exact_baseline
                          else ["fast"]):
            t0 = time.time()
            r = bench_polar_scl8(batch=batch, scan_chunks=chunks,
                                 control_impl=args.control, chunk=args.chunk,
                                 node_mode=node_mode)
            r["wall_s"] = time.time() - t0
            print(f"[probe] {shape} {node_mode}: {r['mbps']:.1f} Mbps "
                  f"BER {r['ber_3db']:.2e}", file=sys.stderr, flush=True)
            results["runs"].append(r)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
            if args.exact_baseline:
                args.exact_baseline = False  # one exact anchor is enough

    print(json.dumps(results["runs"]))


if __name__ == "__main__":
    main()
