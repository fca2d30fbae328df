"""Production-serving demonstrations → results/tpu/serving.json.

1. Adaptive CA-SCL (SC-first, list fallback only for CRC-failing frames):
   the standard serving decoder — at working SNRs the SC pass satisfies
   the CRC for nearly every frame, so throughput approaches the SC rate
   while retaining CA-SCL error performance (1302 Mbps with the mega SC
   kernel on v5e, batch 16384 @2 dB).
2. A 10-million-frame CA-SCL Monte-Carlo point at the waterfall edge:
   213 Mbps end-to-end with the superkernel decoder — 10M frames in
   ~24 s on one chip, resolving error floors (FER 2.4e-6 @0 dB) the
   reference's 100-frame budgets were 5 orders of magnitude away from.

Usage: python tools/serving_runs.py [--cpu] [--frames 10000000]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--snr-db", type=float, default=2.0)
    ap.add_argument("--mc-snr-db", type=float, default=0.0,
                    help="SNR of the 10M-frame point (floor region)")
    ap.add_argument("--sc-impl", default="mega",
                    choices=["unrolled", "mega"],
                    help="SC implementation for the adaptive pass (mega = "
                    "whole-decode Pallas kernel, ~1.5x on v5e)")
    ap.add_argument("--scl-control", default="unroll-kernel",
                    choices=["split", "fused", "kernel", "unroll-kernel"])
    ap.add_argument("--sweep-snrs", default="-1,0,1,1.5,2",
                    help="comma list of SNRs for the end-to-end adaptive "
                         "sweep ('' disables); low points force fallbacks")
    ap.add_argument("--sweep-batch", type=int, default=8192)
    ap.add_argument("--sweep-scan", type=int, default=8,
                    help="batches chained on-chip per dispatch in the sweep")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # Pallas kernels need a TPU backend — portable fallbacks on CPU
        args.sc_impl = "unrolled"
        args.scl_control = "split"
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np
    from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_polar_pipeline
    from polarcode_and_ldpc_tpu.sim.throughput import _force

    N, K, L, B = 1024, 512, 8, args.batch
    frozen, info = fec.construct_polar_code(N, K, "dega", 2.0)
    out = {"device": str(jax.devices()[0])}

    # --- adaptive CA-SCL decode-only rate at the working SNR -------------
    dec = fec.AdaptiveCASCLDecoder(N, K, list_size=L, frozen_bits=frozen,
                                   sc_impl=args.sc_impl,
                                   scl_control_impl=args.scl_control)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, (B, dec.K_data if hasattr(dec, "K_data")
                               else K - 8)).astype(np.int8)
    msgs = np.asarray(dec._crc.encode(jnp.asarray(data)))
    u = np.zeros((B, N), np.int64)
    u[:, info] = msgs
    s = 1
    while s < N:
        u = u.reshape(B, N // (2 * s), 2, s)
        u[:, :, 0, :] ^= u[:, :, 1, :]
        u = u.reshape(B, N)
        s *= 2
    llr = jnp.asarray(awgn_llr_np(u, args.snr_db,
                                  rng.standard_normal((B, N))).astype(np.float32))
    _log("adaptive: compiling SC pass ...")
    t0 = time.perf_counter()
    _force(dec._sc_pass(llr))
    t_compile = time.perf_counter() - t0
    best = float("inf")
    passes = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(5):
            o = dec._sc_pass(llr)
        _force(o)
        best = min(best, (time.perf_counter() - t0) / 5)
        passes = o
    info_bits_dev, ok = passes
    pass_rate = float(np.asarray(ok).mean())
    ber = float((np.asarray(info_bits_dev) != msgs).mean())
    out["adaptive_cascl_sc_pass"] = {
        "sc_impl": args.sc_impl,
        "config": {"N": N, "K": K, "list_size": L, "crc": "CRC-8",
                   "snr_db": args.snr_db, "batch": B},
        "compile_seconds": t_compile,
        "seconds_per_batch": best,
        "decoded_info_mbps": B * (K - 8) / best / 1e6,
        "sc_crc_pass_rate": pass_rate,
        "sc_ber": ber,
        "note": ("device rate of the SC+CRC pass; frames failing CRC "
                 f"(rate {1 - pass_rate:.2e}) re-decode through CA-SCL-{L} "
                 "in fixed-size padded fallback batches"),
    }
    _log(f"adaptive: {out['adaptive_cascl_sc_pass']['decoded_info_mbps']:.0f} "
         f"Mbps SC-pass, CRC pass rate {pass_rate:.6f}")

    # --- adaptive operating-range sweep: the END-TO-END adaptive decode
    # (round-4 single-program form: SC + on-device CRC + stable-argsort
    # compaction + in-graph budget CA-SCL fallback, lax.cond-skipped when
    # the whole batch passes) across SNRs where the fallback actually
    # triggers.  Measured scan-chained with on-device error counting —
    # the same methodology as bench.py (per-dispatch tunnel round-trips
    # and decoded-bit fetches otherwise dominate: the round-3 artifact
    # measured 29 Mbps at 0% fallback purely from host plumbing).  A
    # single-dispatch + host-fetch number is kept for reference. --------
    if args.sweep_snrs:
        from jax import lax

        sweep = []
        sweep_B = args.sweep_batch
        sweep_S = args.sweep_scan
        ada_fn = dec._make_adaptive_pass()

        @jax.jit
        def chained(llr3, msgs3):
            def step(_, x):
                info_b, ok, n_fail = ada_fn(x["llr"])
                bit_err = jnp.sum(info_b != x["msg"], dtype=jnp.int32)
                frame_err = jnp.sum(
                    jnp.any(info_b != x["msg"], axis=1), dtype=jnp.int32)
                return None, (bit_err, frame_err, n_fail)
            _, (be, fe, nf) = lax.scan(step, None,
                                       {"llr": llr3, "msg": msgs3})
            return jnp.sum(be), jnp.sum(fe), jnp.sum(nf)

        for snr_db in (float(s) for s in args.sweep_snrs.split(",")):
            nb = sweep_S * sweep_B
            data_s = rng.integers(0, 2, (nb, K - 8)).astype(np.int8)
            msgs_s = np.asarray(dec._crc.encode(jnp.asarray(data_s)))
            u_s = np.zeros((nb, N), np.int64)
            u_s[:, info] = msgs_s
            s = 1
            while s < N:
                u_s = u_s.reshape(nb, N // (2 * s), 2, s)
                u_s[:, :, 0, :] ^= u_s[:, :, 1, :]
                u_s = u_s.reshape(nb, N)
                s *= 2
            llr_s = jnp.asarray(awgn_llr_np(
                u_s, snr_db, rng.standard_normal((nb, N)))
                .astype(np.float32))
            llr3 = llr_s.reshape(sweep_S, sweep_B, N)
            msgs3 = jnp.asarray(msgs_s.reshape(sweep_S, sweep_B, K))
            t0 = time.perf_counter()
            be, fe, nf = jax.block_until_ready(chained(llr3, msgs3))
            t_comp = time.perf_counter() - t0
            best_s = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = chained(llr3, msgs3)
                _force(o)
                best_s = min(best_s, time.perf_counter() - t0)
            # reference point: one dispatch + full decoded-bits host fetch
            t0 = time.perf_counter()
            bits_h = dec.decode(llr_s[:sweep_B])
            t_single = time.perf_counter() - t0
            n_fail = int(nf)
            point = {
                "snr_db": snr_db,
                "sc_pass_rate": 1.0 - n_fail / nb,
                "fallback_rate": n_fail / nb,
                "scl_fallbacks": n_fail,
                "effective_info_mbps": nb * (K - 8) / best_s / 1e6,
                "seconds_per_batch": best_s / sweep_S,
                "compile_seconds": t_comp,
                "single_dispatch_host_fetch_mbps":
                    sweep_B * (K - 8) / t_single / 1e6,
                "ber": float(be) / (nb * K),
                "fer": float(fe) / nb,
            }
            del bits_h
            sweep.append(point)
            _log(f"adaptive sweep @{snr_db:+.1f} dB: fallback rate "
                 f"{point['fallback_rate']:.4f}, "
                 f"{point['effective_info_mbps']:.1f} Mbps effective "
                 f"(single-dispatch+fetch "
                 f"{point['single_dispatch_host_fetch_mbps']:.1f}), "
                 f"FER {point['fer']:.2e}")
        out["adaptive_sweep"] = {
            "batch": sweep_B,
            "scan_chunks": sweep_S,
            "fallback_budget": dec._budget(sweep_B),
            "note": ("end-to-end adaptive decode, single device program "
                     "(SC + on-device CRC; compaction, gathers, and the "
                     "in-graph budget CA-SCL fallback all behind a "
                     "lax.cond that skips them when the whole batch "
                     "passes — round-5 fix of the ~40% 0%-fallback "
                     "overhead), scan-chained with on-device error "
                     "counts; exactness (adaptive == CA-SCL on "
                     "CRC-failing frames) enforced by "
                     "tests/test_adaptive.py"),
            "points": sweep,
        }

    # --- 10M-frame Monte-Carlo point -------------------------------------
    step = make_polar_pipeline(N, K, frozen, None, decoder="ca-scl",
                               list_size=L,
                               scl_body_impl="xla" if args.cpu else "pallas",
                               scl_chunk=128 if not args.cpu else 64,
                               scl_control_impl=args.scl_control)
    sim = MonteCarloSimulator(step, K - 8, chunk_frames=8192,
                              chunks_per_dispatch=16)
    _log(f"10M-frame CA-SCL @{args.mc_snr_db} dB (compiling) ...")
    t0 = time.perf_counter()
    sim.run(2 * 8192, seed=0, extra_args=(jnp.float32(args.mc_snr_db),))
    _log(f"compile+warmup {time.perf_counter() - t0:.1f}s; running ...")
    t0 = time.perf_counter()
    res = sim.run(args.frames, seed=0,
                  extra_args=(jnp.float32(args.mc_snr_db),))
    wall = time.perf_counter() - t0
    d = res.to_dict()
    d["wall_seconds_post_warmup"] = wall
    d["snr_db"] = args.mc_snr_db
    out["polar_cascl8_n1024_10M"] = d
    _log(f"10M frames in {wall:.1f}s → {d['throughput_mbps']:.1f} Mbps, "
         f"BER {d['ber']:.2e} FER {d['fer']:.2e}")

    OUT.mkdir(parents=True, exist_ok=True)
    # CPU smoke runs must not clobber the committed TPU artifact
    name = "serving_cpu_smoke.json" if args.cpu else "serving.json"
    path = OUT / name
    if path.exists():
        # partial re-runs (e.g. a big-batch sweep at a subset of SNRs)
        # refresh only their entries; keyed sections merge, the sweep
        # keeps distinct batch sizes side by side
        merged = json.loads(path.read_text())
        if "adaptive_sweep" in out and "adaptive_sweep" in merged:
            old_sweep = merged.pop("adaptive_sweep")
            if old_sweep.get("batch") != out["adaptive_sweep"]["batch"]:
                merged[f"adaptive_sweep_b{old_sweep.get('batch')}"] = \
                    old_sweep
        merged.update(out)
        out = merged
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
