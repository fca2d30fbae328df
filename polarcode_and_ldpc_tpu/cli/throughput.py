"""Standalone throughput probe (reference ``benchmarks/throughput_test.py``).

Example:
    python -m polarcode_and_ldpc_tpu.cli.throughput --polar-n 1024 --batch 256
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ._common import add_common_args, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--polar-n", type=int, default=1024)
    p.add_argument("--polar-k", type=int, default=512)
    p.add_argument("--polar-decoder", default="sc", choices=["sc", "scl"])
    p.add_argument("--sc-impl", default="unrolled",
                   choices=["unrolled", "scan", "mega"],
                   help="SC implementation (mega = whole-decode Pallas "
                   "kernel, ~1.5x on TPU); only applies to "
                   "--polar-decoder sc")
    p.add_argument("--bp-impl", default="xla",
                   choices=["xla", "pallas", "auto"],
                   help="BP implementation (auto = fused Pallas kernel "
                   "on TPU, 3.2x)")
    p.add_argument("--list-size", type=int, default=8)
    p.add_argument("--ldpc-n", type=int, default=504)
    p.add_argument("--ldpc-k", type=int, default=252)
    p.add_argument("--max-iter", type=int, default=20)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--snr-db", type=float, default=3.0)
    p.add_argument("--skip-polar", action="store_true")
    p.add_argument("--skip-ldpc", action="store_true")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    setup_platform(args)

    from ..sim.throughput import measure_ldpc_throughput, measure_polar_throughput
    from ..utils import save_results

    results: dict = {}
    if not args.skip_polar:
        results["polar"] = measure_polar_throughput(
            N=args.polar_n, K=args.polar_k, snr_db=args.snr_db,
            batch=args.batch, decoder=args.polar_decoder,
            list_size=args.list_size, seed=args.seed,
            sc_impl=args.sc_impl)
        p = results["polar"]
        print(f"Polar {args.polar_decoder.upper()} N={args.polar_n}: "
              f"enc {p['encoding_throughput']:.2f} / dec {p['decoding_throughput']:.2f} "
              f"/ e2e {p['end_to_end_throughput']:.2f} Mbps "
              f"({p['decode_ms_per_frame']:.4f} ms/frame)")
    if not args.skip_ldpc:
        results["ldpc"] = measure_ldpc_throughput(
            n=args.ldpc_n, k=args.ldpc_k, snr_db=args.snr_db,
            batch=args.batch, max_iter=args.max_iter, seed=args.seed,
            bp_impl=args.bp_impl)
        l = results["ldpc"]
        print(f"LDPC BP n={args.ldpc_n}: "
              f"enc {l['encoding_throughput']:.2f} / dec {l['decoding_throughput']:.2f} "
              f"/ e2e {l['end_to_end_throughput']:.2f} Mbps "
              f"({l['decode_ms_per_frame']:.4f} ms/frame)")
    save_results(results, Path(args.output_dir) / "data" / "throughput_results.json")
    return results


if __name__ == "__main__":
    main()
