#!/usr/bin/env python
"""A/B the flagship SCL chained-scan batch shape on the real TPU.

The bench upgrade stage runs unroll-kernel / chunk 64 over 131072
frames per dispatch.  This probe holds total frames fixed and sweeps
the (batch, scan_chunks) split.  Measured (v5e, 2026-08-18):
16384x8 215.1, 8192x16 240.8, 4096x32 246.8, 2048x64 238.9 Mbps —
bench.py's upgrade stage now uses 4096x32.

Usage: python tools/scl_batch_shape_ab.py [--shapes 8192x16,16384x8,4096x32]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="16384x8,4096x32",
                    help="comma list of BATCHxSCAN")
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--control", default="unroll-kernel")
    ap.add_argument("--node-mode", default="exact", choices=["exact", "fast"])
    ap.add_argument("--batch-tile", type=int, default=128)
    args = ap.parse_args()

    import bench

    for shape in args.shapes.split(","):
        batch, scan = (int(v) for v in shape.split("x"))
        t0 = time.time()
        r = bench.bench_polar_scl8(batch=batch, control_impl=args.control,
                                   chunk=args.chunk, scan_chunks=scan,
                                   node_mode=args.node_mode,
                                   batch_tile=args.batch_tile)
        print(f"shape {batch}x{scan}: {r['mbps']:.1f} Mbps "
              f"(BER {r['ber_3db']:.2e}, total {time.time()-t0:.0f}s)",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
