"""Million-frame Monte-Carlo at the LARGE-code configs (BASELINE.json
configs[4]: "Large-batch Monte-Carlo: N=4096 SCL-32 + n=8192 LDPC, 1M
frames") — the decode-only artifacts (results/tpu/polar_n4096_scl32.json,
ldpc_n8192_qc_bp.json) demonstrate the decoders; this runs the full
rng → encode → channel → decode → count pipeline through the resumable
chunk-pipelined simulator, exactly like the flagship million-frame run
(tools/million_frame_run.py), and writes
results/tpu/large_code_million_frame.json.

Reference analogue: the per-frame Monte-Carlo loops of
``benchmarks/ber_simulation.py:167-192`` at the largest sweep sizes
(``benchmarks/test_code_parameters.py:31-36``), which the reference only
ever ran for ≤100 frames.

Usage: python tools/large_code_mc.py [--frames 1000000]
       [--skip-polar] [--skip-ldpc] [--polar-snr 0.5] [--ldpc-snr -1.25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = Path(__file__).resolve().parent.parent / "results" / "tpu"


def _log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1_000_000)
    ap.add_argument("--polar-snr", type=float, default=0.5)
    ap.add_argument("--ldpc-snr", type=float, default=-1.25)
    ap.add_argument("--polar-chunk", type=int, default=512,
                    help="frames per device chunk (HBM-bound at N=4096 L=32)")
    ap.add_argument("--ldpc-chunk", type=int, default=2048)
    ap.add_argument("--polar-cpd", type=int, default=4)
    ap.add_argument("--ldpc-cpd", type=int, default=8)
    ap.add_argument("--scl-chunk", type=int, default=128)
    ap.add_argument("--scl-leaf", default="sort", choices=["onehot", "sort"])
    ap.add_argument("--scl-control", default="split",
                    choices=["split", "fused", "kernel", "unroll-fused",
                             "unroll-kernel"])
    ap.add_argument("--polar-max-errors", type=int, default=None,
                    help="early-stop frame-error cap for the polar run "
                         "(exercises the exact crossing accounting at scale)")
    ap.add_argument("--polar-scout", default="",
                    help="comma list of SNRs: quick FER scout (40k frames / "
                         "200 error cap each, same compiled runtime-SNR "
                         "pipeline) before the 1M run; the point with FER "
                         "closest to 3e-3 within [5e-4, 3e-2] replaces "
                         "--polar-snr so the million-frame run exercises "
                         "real early-stop accounting in the waterfall")
    ap.add_argument("--ldpc-decoder", default="bp", choices=["bp", "nms"])
    ap.add_argument("--ldpc-schedule", default="flooding",
                    choices=["flooding", "layered"],
                    help="layered = the serving schedule (min-sum only; "
                         "~2x fewer iterations at waterfall SNRs — "
                         "results/tpu/ldpc_layered.json)")
    ap.add_argument("--ldpc-normalization", type=float, default=0.75)
    ap.add_argument("--ldpc-parity-frames", type=int, default=0,
                    help="run a PAIRED flooding-vs-layered NMS error-rate "
                         "comparison over this many frames first (same "
                         "global frame ids → identical messages/noise), "
                         "writing Wilson-CI FERs per schedule")
    ap.add_argument("--skip-ldpc", action="store_true")
    ap.add_argument("--skip-polar", action="store_true")
    ap.add_argument("--cpu", action="store_true")
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

    out = {"note": ("million-frame end-to-end Monte-Carlo at the LARGE-code "
                    "configs on one TPU v5e chip (chunk-pipelined resumable "
                    "simulator; frames keyed by global id; multi-chunk "
                    "dispatches). N=4096 SCL-32 uses the chunk-scan decoder "
                    "with sort-based leaf selection; n=8192 QC-LDPC uses the "
                    "roll-based gather-free BP."),
           "device": str(jax.devices()[0])}

    if not args.skip_polar:
        N, K, L = 4096, 2048, 32
        frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
        step = make_polar_pipeline(N, K, frozen, None, decoder="scl",
                                   list_size=L, scl_chunk=args.scl_chunk,
                                   scl_leaf_impl=args.scl_leaf,
                                   scl_control_impl=args.scl_control)
        sim = MonteCarloSimulator(step, K, chunk_frames=args.polar_chunk,
                                  chunks_per_dispatch=args.polar_cpd)
        _log(f"polar SCL-{L} N={N}: {args.frames} frames @{args.polar_snr} dB,"
             f" chunk {args.polar_chunk} x{args.polar_cpd} (compiling) ...")
        t0 = time.perf_counter()
        sim.run(2 * args.polar_chunk * args.polar_cpd, seed=0,
                extra_args=(jnp.float32(args.polar_snr),))
        _log(f"polar: compile+warmup {time.perf_counter() - t0:.1f}s")
        if args.polar_scout:
            scout = []
            for snr in (float(s) for s in args.polar_scout.split(",")):
                r = sim.run(40000, max_errors=200, seed=1,
                            extra_args=(jnp.float32(snr),))
                scout.append({"snr_db": snr, "frames": r.frames,
                              "frame_errors": r.frame_errors,
                              "fer": r.frame_errors / max(r.frames, 1)})
                _log(f"polar scout @{snr:+.2f} dB: FER "
                     f"{scout[-1]['fer']:.2e} ({r.frames} frames)")
            ok_pts = [p for p in scout if 5e-4 <= p["fer"] <= 3e-2]
            if ok_pts:
                pick = min(ok_pts, key=lambda p: abs(np.log(p["fer"] / 3e-3)))
                args.polar_snr = pick["snr_db"]
                _log(f"polar scout picked {args.polar_snr:+.2f} dB "
                     f"(FER {pick['fer']:.2e})")
            else:
                _log("polar scout found no waterfall point; keeping "
                     f"--polar-snr {args.polar_snr}")
            out["polar_scl32_n4096_scout"] = scout
        t0 = time.perf_counter()
        res = sim.run(args.frames, max_errors=args.polar_max_errors, seed=0,
                      extra_args=(jnp.float32(args.polar_snr),))
        wall = time.perf_counter() - t0
        d = res.to_dict()
        d.update(wall_seconds_post_warmup=wall, snr_db=args.polar_snr,
                 max_errors=args.polar_max_errors,
                 scl_chunk=args.scl_chunk, scl_leaf=args.scl_leaf,
                 scl_control=args.scl_control,
                 chunk_frames=args.polar_chunk,
                 chunks_per_dispatch=args.polar_cpd)
        out["polar_scl32_n4096_1M"] = d
        _log(f"polar: {d['throughput_mbps']:.1f} Mbps end-to-end, "
             f"BER {d['ber']:.2e} FER {d['fer']:.2e}")

    if not args.skip_ldpc:
        n, k, z = 8192, 4096, 512
        _log("ldpc: QC construction + systematic G (host) ...")
        t0 = time.perf_counter()
        base = fec.qc_base_matrix(n, k, z, dv=3, dc=6, seed=42)
        H = fec.qc_expand(base, z)
        enc = fec.LDPCEncoder(n, k, H=H)
        t_constr = time.perf_counter() - t0

        def _ldpc_sim(decoder, schedule):
            step = make_ldpc_pipeline(
                enc.H, enc.G, None, decoder=decoder, max_iter=20,
                normalization=(args.ldpc_normalization if decoder == "nms"
                               else 1.0),
                message_idx=enc.info_positions, qc_base=base, z=z,
                schedule=schedule)
            return MonteCarloSimulator(step, enc.k,
                                       chunk_frames=args.ldpc_chunk,
                                       chunks_per_dispatch=args.ldpc_cpd)

        if args.ldpc_parity_frames:
            # PAIRED schedules comparison: same seed + same global frame
            # ids → bit-identical messages and noise for both decoders,
            # so any FER gap is the schedule's, not sampling noise.
            from polarcode_and_ldpc_tpu.utils.metrics import (
                wilson_confidence_interval,
            )

            parity = {"frames": args.ldpc_parity_frames,
                      "snr_db": args.ldpc_snr, "decoder": "nms",
                      "normalization": args.ldpc_normalization,
                      "paired_noise": True}
            for sched in ("flooding", "layered"):
                simp = _ldpc_sim("nms", sched)
                _log(f"ldpc parity [{sched}]: compiling ...")
                simp.run(2 * args.ldpc_chunk * args.ldpc_cpd, seed=0,
                         extra_args=(jnp.float32(args.ldpc_snr),))
                r = simp.run(args.ldpc_parity_frames, seed=0,
                             extra_args=(jnp.float32(args.ldpc_snr),))
                lo, hi = wilson_confidence_interval(
                    r.frame_errors, r.frames)
                parity[sched] = {
                    "frames": r.frames, "frame_errors": r.frame_errors,
                    "fer": r.frame_errors / max(r.frames, 1),
                    "fer_wilson_95": [lo, hi],
                    "ber": r.to_dict()["ber"],
                    "avg_iterations": r.to_dict()["avg_iterations"],
                }
                _log(f"ldpc parity [{sched}]: FER "
                     f"{parity[sched]['fer']:.3e} "
                     f"[{lo:.3e}, {hi:.3e}], avg iters "
                     f"{parity[sched]['avg_iterations']:.2f}")
            out["ldpc_n8192_schedule_parity"] = parity

        sched = args.ldpc_schedule
        dec_name = args.ldpc_decoder
        sim = _ldpc_sim(dec_name, sched)
        _log(f"ldpc QC-{dec_name}/{sched} n={n}: {args.frames} frames "
             f"@{args.ldpc_snr} dB, chunk {args.ldpc_chunk} "
             f"x{args.ldpc_cpd} (compiling) ...")
        t0 = time.perf_counter()
        sim.run(2 * args.ldpc_chunk * args.ldpc_cpd, seed=0,
                extra_args=(jnp.float32(args.ldpc_snr),))
        _log(f"ldpc: compile+warmup {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        res = sim.run(args.frames, seed=0,
                      extra_args=(jnp.float32(args.ldpc_snr),))
        wall = time.perf_counter() - t0
        d = res.to_dict()
        d.update(wall_seconds_post_warmup=wall, snr_db=args.ldpc_snr,
                 construction_seconds=t_constr,
                 schedule=sched, decoder=dec_name,
                 chunk_frames=args.ldpc_chunk,
                 chunks_per_dispatch=args.ldpc_cpd)
        key = ("ldpc_qcbp_n8192_1M" if (dec_name, sched) ==
               ("bp", "flooding")
               else f"ldpc_qc{dec_name}_{sched}_n8192_1M")
        out[key] = d
        _log(f"ldpc: {d['throughput_mbps']:.1f} Mbps end-to-end, "
             f"BER {d['ber']:.2e} FER {d['fer']:.2e}, "
             f"avg iters {d['avg_iterations']:.2f}")

    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "large_code_million_frame.json"
    if path.exists():  # partial runs (--skip-*) refresh only their entries
        merged = json.loads(path.read_text())
        merged.update(out)
        out = merged
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
