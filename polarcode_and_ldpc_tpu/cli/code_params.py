"""Code-parameter sweeps (reference ``benchmarks/test_code_parameters.py``):
code length at fixed rate 0.5, and code rate at fixed length.

Example:
    python -m polarcode_and_ldpc_tpu.cli.code_params --families polar,ldpc
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ._common import add_common_args, get_mesh, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    # reference defaults (test_code_parameters.py:31-36, :160)
    p.add_argument("--polar-lengths", default="128,256,512,1024,2048,4096")
    p.add_argument("--ldpc-lengths", default="126,252,504,1008,2016,4032")
    p.add_argument("--rates", default="0.25,0.33,0.5,0.67,0.75,0.875")
    p.add_argument("--rate-length", type=int, default=1024)
    p.add_argument("--snr-db", type=float, default=3.0)
    p.add_argument("--num-frames", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--families", default="polar,ldpc")
    p.add_argument("--skip-rates", action="store_true")
    p.add_argument("--skip-lengths", action="store_true")
    p.add_argument("--sc-impl", default="unrolled",
                   choices=["unrolled", "scan", "mega"],
                   help="polar SC implementation for the throughput probes "
                   "(mega = whole-decode Pallas kernel)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    setup_platform(args)

    from ..core.config import LDPCCodeConfig, PolarCodeConfig, SimulationConfig
    from ..sim.experiments import simulate_ldpc, simulate_polar, test_code_lengths
    from ..utils import save_results

    mesh = get_mesh(args)
    outdir = Path(args.output_dir)
    families = args.families.split(",")
    results: dict = {"length_tests": {}, "rate_tests": {}}

    if not args.skip_lengths:
        for fam in families:
            lengths = [int(x) for x in
                       (args.polar_lengths if fam == "polar"
                        else args.ldpc_lengths).split(",")]
            print(f"{fam} length sweep {lengths} @ {args.snr_db} dB:")
            res = test_code_lengths(fam, lengths, rate=0.5, snr_db=args.snr_db,
                                    num_frames=args.num_frames,
                                    batch_size=args.batch_size, mesh=mesh,
                                    sc_impl=args.sc_impl)
            for e in res:
                msg = (f"  N={e['length']}: BER {e.get('ber', 'ERR'):.2e} "
                       f"dec {e.get('decoding_throughput', 0):.3f} Mbps"
                       if "ber" in e else f"  N={e['length']}: {e['error']}")
                print(msg)
            results["length_tests"][fam] = res

    if not args.skip_rates:
        rates = [float(r) for r in args.rates.split(",")]
        N = args.rate_length
        sim = SimulationConfig(snr_start=args.snr_db, snr_stop=args.snr_db,
                               snr_step=1, num_frames=args.num_frames,
                               max_errors=None, batch_size=args.batch_size,
                               seed=args.seed)
        from ..sim.throughput import (measure_ldpc_throughput,
                                      measure_polar_throughput)

        for fam in families:
            out = []
            print(f"{fam} rate sweep {rates} @ N={N}, {args.snr_db} dB:")
            for rate in rates:
                entry: dict = {"rate": rate, "length": N}
                try:
                    if fam == "polar":
                        cfg = PolarCodeConfig(N=N, K=int(N * rate), algorithm="sc")
                        curve = simulate_polar(cfg, sim, mesh)
                        thpt = measure_polar_throughput(
                            N=N, K=cfg.K, snr_db=args.snr_db,
                            batch=args.batch_size, sc_impl=args.sc_impl)
                    else:
                        k = int(N * rate)
                        m = N - k
                        dc = max(4, int(round(3 * N / m)))
                        cfg = LDPCCodeConfig(n=N, k=k, dv=3, dc=dc)
                        curve = simulate_ldpc(cfg, sim, mesh)
                        thpt = measure_ldpc_throughput(
                            n=N, k=k, dv=3, dc=dc, snr_db=args.snr_db,
                            batch=args.batch_size, bp_impl="auto")
                    # steady-state decode rate (warm-up + forced completion,
                    # sim/throughput.py), NOT the MC sweep's first point —
                    # that elapsed time includes compilation and misstated
                    # TPU throughput by 3-4 orders of magnitude
                    # (reference semantics: throughput_test.py:212-253)
                    entry.update(ber=curve["ber"][0], fer=curve["fer"][0],
                                 throughput_mbps=thpt["decoding_throughput"],
                                 decode_ms_per_frame=thpt["decode_ms_per_frame"])
                    print(f"  rate {rate}: BER {entry['ber']:.2e} "
                          f"dec {entry['throughput_mbps']:.1f} Mbps")
                except Exception as e:  # record-and-continue (reference :251-258)
                    entry["error"] = str(e)
                    print(f"  rate {rate}: ERROR {e}")
                out.append(entry)
            results["rate_tests"][fam] = out

    save_results(results, outdir / "code_params_results.json")
    print(f"Done → {outdir}/")
    return results


if __name__ == "__main__":
    main()
