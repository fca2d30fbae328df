#!/usr/bin/env python
"""Canned quick benchmark (reference ``debug_scripts/quick_benchmark.py``:
SNR 1..5 step 1, small frame budget, both code families).

Usage: python tools/quick_benchmark.py [--platform cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--frames", type=int, default=200)
    args = ap.parse_args()
    from polarcode_and_ldpc_tpu.cli.run_benchmark import main as rb

    argv = ["--snr-range", "1:5:1", "--num-frames", str(args.frames),
            "--max-errors", "50", "--batch-size", "100",
            "--output-dir", "/tmp/quick_benchmark", "--skip-plots",
            "--skip-throughput"]
    if args.platform:
        argv += ["--platform", args.platform]
    rb(argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
