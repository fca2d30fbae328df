"""Headline benchmark: decoded info Mbps/chip.

Primary metric (BASELINE.json): SCL-8 polar decode at N=1024 K=512, AWGN
3 dB — decoded information bits per second on one chip.  The reference's CPU
number is ≈5e-4 Mbps (BASELINE.md, extrapolated from its committed results);
``vs_baseline`` is the speedup over that.  A secondary LDPC BP n=504 number
(reference: 7.95e-5 Mbps) is reported in the same JSON line.

Prints ONE JSON line to stdout:
``{"metric": ..., "value": N, "unit": "Mbps", "vs_baseline": N, ...}``
(progress goes to stderr; the headline line is also emitted early so a
tunnel stall in the secondary benchmark cannot lose it).

Staged structure (the driver reads the LAST complete line): a safe
XLA-bodied polar line lands within ~3 min, the LDPC fields within ~4, the
SC mega-kernel fields (~4 s compile) right after, then the superkernel
polar decode (~2.2x but ~3.5-8 min compile over the tunnel) as the
headline upgrade, and finally the SSCL fast-node SERVING number as an
informational field (`scl_fast_serving_mbps`) — each stage can only add,
never lose, earlier lines.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SCL8_N1024_MBPS = 5e-4    # BASELINE.md "Derived: SCL-8 N=1024 decode"
BASELINE_BP_N504_MBPS = 7.95e-5    # BASELINE.md "LDPC BP decode throughput"
BASELINE_SC_N1024_MBPS = 0.00398   # BASELINE.md "Polar SC decode"


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _force(out) -> None:
    """Force real completion (see ``sim.throughput._force``:
    ``block_until_ready`` over the remote-TPU tunnel can acknowledge before
    execution finishes — measured 0.1 ms "latency" for a 268 ms program)."""
    from polarcode_and_ldpc_tpu.sim.throughput import _force as f

    f(out)


def _time_steady_state(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    for _ in range(warmup):
        _force(fn(*args))
    best = float("inf")
    for _ in range(3):  # median-free best-of-3 to dodge tunnel contention
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _awgn_llrs_host(codewords, snr_db: float, seed: int):
    """Host-side NumPy channel (exact reference semantics via parity/).

    Every device compile over the remote-TPU tunnel can stall for minutes;
    the benchmark therefore compiles ONLY the two decoders and stages all
    inputs from the host."""
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    noise = np.random.default_rng(seed).standard_normal(codewords.shape)
    return awgn_llr_np(codewords, snr_db, noise).astype(np.float32)


def _polar_encode_host(msgs, N, info_bits):
    """Vectorized NumPy butterfly encode (reference utils.py:219-228)."""
    u = np.zeros((msgs.shape[0], N), np.int64)
    u[:, info_bits] = msgs
    s = 1
    while s < N:
        u = u.reshape(msgs.shape[0], N // (2 * s), 2, s)
        u[:, :, 0, :] ^= u[:, :, 1, :]
        u = u.reshape(msgs.shape[0], N)
        s *= 2
    return u


def bench_polar_scl8(batch: int = 8192, body_impl: str = "xla",
                     control_impl: str = "split", chunk: int = 128,
                     scan_chunks: int = 0, node_mode: str = "exact",
                     perm_impl: str = "rank", batch_tile: int = 128) -> dict:
    # chunk-scan decoder (models/polar/scanscl.py): compile is O(unique
    # subtree patterns) and the batch-last layout keeps lanes full, so big
    # batches are affordable.  v5e (2026-08-17): XLA bodies 116.4 Mbps at
    # batch 8192 / chunk 128, compile ~2.7 min — the safe line (fused
    # control REGRESSES XLA bodies, 111 vs 116, so it keeps split).  The
    # best known config is control_impl="unroll-kernel" (whole chunk steps
    # as straight-line Pallas superkernels incl. the fused last chunk) at
    # chunk 64: 207.5 Mbps, compile ~4.5-8 min over the tunnel — benched
    # as a staged upgrade after the safe line is out (chunk sweep, same
    # session: 32→171.4, 64→207.5, 128→175.1, 256→201.7 Mbps).  The
    # round-1 unrolled decoder peaked at 23.8 Mbps @ batch 512.
    import jax

    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder
    from polarcode_and_ldpc_tpu.utils.complexity import (
        decode_roofline,
        polar_complexity,
    )

    N, K, L, snr_db = 1024, 512, 8, 3.0
    frozen, info_bits = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    frozen_mask = frozen_mask_from_positions(N, frozen)
    nb = max(scan_chunks, 1) * batch
    msgs = np.random.default_rng(0).integers(0, 2, (nb, K)).astype(np.int8)
    _log("polar: encoding + channel (host) ...")
    cw = _polar_encode_host(msgs, N, info_bits)
    llr = jnp.asarray(_awgn_llrs_host(cw, snr_db, seed=42))

    _log(f"polar: compiling SCL-8 N=1024 (scan-chunked/{body_impl}/"
         f"{control_impl}, batch {batch}"
         + (f" x{scan_chunks} scan" if scan_chunks else "") + ") ...")
    dec = make_scl_decoder(N, frozen_mask, L, impl="scan-chunked",
                           body_impl=body_impl, chunk=chunk,
                           control_impl=control_impl, node_mode=node_mode,
                           perm_impl=perm_impl, batch_tile=batch_tile)
    if scan_chunks:
        # on-chip chained decode: a lax.scan walks scan_chunks batches in
        # ONE dispatched program (the remote-tunnel dispatch round-trip
        # otherwise serializes with compute and taxes the measurement
        # ~19%; a locally attached chip would not pay it).  BER comes back
        # from the same program via an on-device argmax-path error count,
        # so correctness is still proven on every timed run.
        import jax.numpy as _jnp
        from jax import lax

        llr3 = llr.reshape(scan_chunks, batch, N)
        msgs_dev = jnp.asarray(msgs.reshape(scan_chunks, batch, K))
        info_idx = jnp.asarray(info_bits, _jnp.int32)

        @jax.jit
        def scan_decode(llrs, msgs3):
            def step(_, x):
                u, m = dec(x["llr"])
                sel = _jnp.argmax(m, axis=1)
                best = _jnp.take_along_axis(
                    u, sel[:, None, None], axis=1)[:, 0, :]
                errs = _jnp.sum(best[:, info_idx] != x["msg"],
                                dtype=_jnp.int32)
                return None, errs
            _, errs = lax.scan(step, None, {"llr": llrs, "msg": msgs3})
            return _jnp.sum(errs)

        t_first = time.perf_counter()
        total_errs = jax.block_until_ready(scan_decode(llr3, msgs_dev))
        _log(f"polar: compile+first run {time.perf_counter() - t_first:.1f}s")
        t = _time_steady_state(scan_decode, llr3, msgs_dev, iters=3)
        mbps = nb * K / t / 1e6
        ber = float(np.asarray(total_errs)) / (nb * K)
    else:
        decode = jax.jit(dec)
        t_first = time.perf_counter()
        u_paths, metrics = jax.block_until_ready(decode(llr))
        _log(f"polar: compile+first run {time.perf_counter() - t_first:.1f}s")
        t = _time_steady_state(decode, llr)
        mbps = batch * K / t / 1e6
        # correctness spot-check on host (argmax-metric path selection)
        u_np, m_np = np.asarray(u_paths), np.asarray(metrics)
        best = u_np[np.arange(batch), np.argmax(m_np, axis=1)][:, info_bits]
        ber = float((best != msgs).mean())
    # roofline anchor (north star): achieved algorithmic op rate vs chip
    # ceiling, using the reference's closed-form op count for comparability
    ops = polar_complexity(N, K, L)["scl_decoding"]["operations"]
    roof = decode_roofline(ops, nb / t)
    _log(f"polar: {mbps:.1f} Mbps, BER@3dB {ber:.2e}, "
         f"alg {roof['algorithmic_ops_per_s'] / 1e9:.1f} Gop/s")
    return {"mbps": mbps, "seconds_per_batch": t, "batch": batch,
            "scan_chunks": scan_chunks, "node_mode": node_mode,
            "ber_3db": ber, "roofline": roof}


def bench_ldpc_bp(batch: int = 4096, scan_chunks: int = 16,
                  decoder: str = "bp", impl: str = "auto",
                  snr_db: float = 3.0, num_layers: int = 4) -> dict:
    # fused whole-decode BP kernel with per-tile early exit (impl="auto"
    # resolves to Pallas on TPU: 731 vs 231 Mbps measured), chained
    # on-chip with an on-device error count (same methodology as the
    # SCL/SC stages — per-dispatch tunnel round-trips otherwise tax the
    # measurement).  ``decoder``/``impl`` let probes A/B the min-sum
    # family (tools/minsum_tpu_probe.py) with this exact harness.
    import jax
    import jax.numpy as jnp
    from jax import lax

    import polarcode_and_ldpc_tpu as fec

    from polarcode_and_ldpc_tpu.utils.complexity import (
        decode_roofline,
        ldpc_complexity,
    )

    n, k = 504, 252
    enc = fec.LDPCEncoder(n, k, dv=3, dc=6, seed=42)
    if decoder == "bp":
        dec = fec.BPDecoder(enc.H, max_iter=20, early_stop=True, impl=impl)
    elif decoder == "layered-nms":
        dec = fec.LayeredMSDecoder(enc.H, max_iter=20, normalization=0.75,
                                   early_stop=True, impl=impl,
                                   num_layers=num_layers)
    else:
        from polarcode_and_ldpc_tpu.models.ldpc.minsum import (
            MSDecoder, NMSDecoder, OMSDecoder)

        ctor = {"ms": MSDecoder, "nms": NMSDecoder, "oms": OMSDecoder}[decoder]
        dec = ctor(enc.H, max_iter=20, early_stop=True, impl=impl)
    nb = scan_chunks * batch
    msgs = np.random.default_rng(1).integers(0, 2, (nb, enc.k)).astype(np.int8)
    _log("ldpc: encoding + channel (host) ...")
    cw = (msgs.astype(np.int64) @ np.asarray(enc.G)) % 2
    llr3 = jnp.asarray(_awgn_llrs_host(cw, snr_db, seed=43)).reshape(
        scan_chunks, batch, n)
    msgs3 = jnp.asarray(msgs.reshape(scan_chunks, batch, enc.k))
    info_idx = jnp.asarray(enc.info_positions, jnp.int32)
    run = dec._decode_pallas if dec.impl == "pallas" else dec._decode

    @jax.jit
    def scan_decode(llrs, m3):
        def step(_, x):
            bits, _it = run(x["llr"])
            return None, jnp.sum(bits[:, info_idx] != x["msg"],
                                 dtype=jnp.int32)
        return jnp.sum(lax.scan(step, None, {"llr": llrs, "msg": m3})[1])

    _log(f"ldpc: compiling BP n=504 ({dec.impl}, x{scan_chunks} scan) ...")
    t_first = time.perf_counter()
    errs = jax.block_until_ready(scan_decode(llr3, msgs3))
    _log(f"ldpc: compile+first run {time.perf_counter() - t_first:.1f}s")
    # best of TWO time-separated steady measurements: the r3→r4 bench
    # lines spread ±4% on this stage with no code change (tunnel
    # contention operates on minute scales, inside which best-of-3 sits
    # entirely) — the second pass plus max() makes real regressions
    # distinguishable from tunnel noise (VERDICT r4 item 7)
    t_a = _time_steady_state(scan_decode, llr3, msgs3, iters=3)
    t_b = _time_steady_state(scan_decode, llr3, msgs3, warmup=0, iters=3)
    t = min(t_a, t_b)
    spread = abs(t_a - t_b) / t
    if spread > 0.02:
        _log(f"ldpc: steady-state passes spread {spread:.1%} "
             f"({t_a * 1e3:.2f} vs {t_b * 1e3:.2f} ms) — tunnel noise")
    mbps = nb * enc.k / t / 1e6
    ber = float(np.asarray(errs)) / (nb * enc.k)
    ops = ldpc_complexity(n, k, 3, 6, 20)["bp_decoding"]["operations"]
    roof = decode_roofline(ops, nb / t)
    _log(f"ldpc: {mbps:.1f} Mbps, BER@3dB {ber:.2e}")
    return {"mbps": mbps, "seconds_per_batch": t, "batch": batch,
            "scan_chunks": scan_chunks, "bp_impl": dec.impl,
            "steady_spread": round(spread, 4),
            "ber_3db": ber, "roofline": roof}


def bench_sc_mega(batch: int = 16384, scan_chunks: int = 8) -> dict:
    # whole-decode SC Pallas kernel (ops/sc_mega_pallas.py): ~4-18 s
    # compile.  Chained on-chip (lax.scan, on-device error count — the
    # per-dispatch tunnel round-trip is ~60% of a single-dispatch SC
    # measurement): 3565 Mbps on v5e vs 1408 dispatched singly, 947 for
    # the unrolled XLA fast path.
    import jax
    import jax.numpy as jnp
    from jax import lax

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.sc import make_sc_decoder

    N, K, snr_db = 1024, 512, 3.0
    nb = scan_chunks * batch
    frozen, info_bits = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    frozen_mask = frozen_mask_from_positions(N, frozen)
    msgs = np.random.default_rng(2).integers(0, 2, (nb, K)).astype(np.int8)
    _log("sc: encoding + channel (host) ...")
    cw = _polar_encode_host(msgs, N, info_bits)
    llr3 = jnp.asarray(_awgn_llrs_host(cw, snr_db, seed=44)).reshape(
        scan_chunks, batch, N)
    msgs3 = jnp.asarray(msgs.reshape(scan_chunks, batch, K))
    info_idx = jnp.asarray(info_bits, jnp.int32)
    _log("sc: compiling mega SC N=1024 ...")
    dec = make_sc_decoder(N, frozen_mask, impl="mega")

    @jax.jit
    def scan_decode(llrs, m3):
        def step(_, x):
            u = dec(x["llr"])
            return None, jnp.sum(u[:, info_idx] != x["msg"],
                                 dtype=jnp.int32)
        return jnp.sum(lax.scan(step, None, {"llr": llrs, "msg": m3})[1])

    t_first = time.perf_counter()
    errs = jax.block_until_ready(scan_decode(llr3, msgs3))
    _log(f"sc: compile+first run {time.perf_counter() - t_first:.1f}s")
    t = _time_steady_state(scan_decode, llr3, msgs3, iters=3)
    mbps = nb * K / t / 1e6
    ber = float(np.asarray(errs)) / (nb * K)
    _log(f"sc: {mbps:.1f} Mbps, BER@3dB {ber:.2e}")
    return {"mbps": mbps, "ber_3db": ber, "batch": batch,
            "scan_chunks": scan_chunks}


def main() -> None:
    # NOTE: do NOT enable jax's persistent compilation cache here — over the
    # remote-TPU (axon) tunnel a cached-executable *load* measures ~70 s,
    # slower than recompiling; measured 2026-08-17.
    import jax

    _log(f"device: {jax.devices()[0]}")
    # headline metric first; emit a partial JSON line immediately so a
    # tunnel stall during the secondary benchmark can't lose the result
    # (the driver reads the LAST complete line)
    # the safe line uses the same chained-scan methodology as the
    # upgrade stage so the upgrade guard below compares like for like
    polar = bench_polar_scl8(scan_chunks=16)
    result = {
        "metric": "polar_scl8_n1024_decoded_info_mbps_per_chip",
        "value": round(polar["mbps"], 3),
        "unit": "Mbps",
        "vs_baseline": round(polar["mbps"] / BASELINE_SCL8_N1024_MBPS, 1),
        "polar_ber_3db": polar["ber_3db"],
        "mfu_estimate": round(polar["roofline"]["mfu_vs_bf16_peak"], 6),
        "alg_gops_per_s": round(
            polar["roofline"]["algorithmic_ops_per_s"] / 1e9, 2),
        "scl_body": "xla",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)
    ldpc = bench_ldpc_bp()
    result.update(
        ldpc_bp_n504_mbps=round(ldpc["mbps"], 3),
        ldpc_vs_baseline=round(ldpc["mbps"] / BASELINE_BP_N504_MBPS, 1),
        ldpc_ber_3db=ldpc["ber_3db"],
        ldpc_mfu_estimate=round(ldpc["roofline"]["mfu_vs_bf16_peak"], 6),
        ldpc_steady_spread=ldpc["steady_spread"],
    )
    print(json.dumps(result), flush=True)
    # cheap informational stage: layered (serving-schedule) NMS — the
    # round-4 LDPC serving lever (flooding stays the reference-exact
    # headline field above); num_layers=2 fits the layer-major kernel
    try:
        lay = bench_ldpc_bp(decoder="layered-nms", num_layers=2)
        result.update(
            ldpc_layered_nms_mbps=round(lay["mbps"], 1),
            ldpc_layered_ber_3db=lay["ber_3db"],
        )
        print(json.dumps(result), flush=True)
    except Exception as e:  # noqa: BLE001 — bench must not die here
        _log(f"layered stage failed (keeping prior line): {e!r}")
    # cheap stage (~4 s compile): the whole-decode SC Pallas kernel
    try:
        sc = bench_sc_mega()
        result.update(
            sc_mega_n1024_mbps=round(sc["mbps"], 1),
            sc_vs_baseline=round(sc["mbps"] / BASELINE_SC_N1024_MBPS, 1),
            sc_ber_3db=sc["ber_3db"],
        )
        print(json.dumps(result), flush=True)
    except Exception as e:  # noqa: BLE001 — bench must not die here
        _log(f"sc mega stage failed (keeping prior line): {e!r}")
    # staged upgrade: whole-chunk-step Pallas superkernels (unroll-kernel)
    # are ~3.8x the safe line but compile ~2-5 min over the tunnel;
    # attempt them LAST so a stall/kill can only lose the upgrade, never
    # the safe lines above (the driver reads the last complete line).
    # batch-shape sweep at fixed 131072 frames (v5e, 2026-08-18,
    # tools/scl_batch_shape_ab.py): 16384x8 215.1, 8192x16 240.8,
    # 4096x32 246.8, 2048x64 238.9 — 4096x32 is the optimum.  With the
    # round-3 rank algebra the chunk optimum moved 64 → 128 (v5e,
    # 2026-08-19: c64 254.8, c128 277.7; 8192x16 c128 272.8).  Round 4
    # (state-DMA elision, packed butterfly, bit-level f_minsum): 448.6.
    # Round 5 (live-width decoding, narrow superkernels): 462.4.
    try:
        polar_p = bench_polar_scl8(batch=4096, control_impl="unroll-kernel",
                                   chunk=128, scan_chunks=32)
    except Exception as e:  # noqa: BLE001 — bench must not die here
        _log(f"polar pallas upgrade failed (keeping xla line): {e!r}")
        return
    if polar_p["mbps"] > polar["mbps"]:
        result.update(
            value=round(polar_p["mbps"], 3),
            vs_baseline=round(polar_p["mbps"] / BASELINE_SCL8_N1024_MBPS, 1),
            polar_ber_3db=polar_p["ber_3db"],
            mfu_estimate=round(polar_p["roofline"]["mfu_vs_bf16_peak"], 6),
            alg_gops_per_s=round(
                polar_p["roofline"]["algorithmic_ops_per_s"] / 1e9, 2),
            scl_body="in-kernel",
            scl_control="unroll-kernel",
            scl_chunk=128,
            scl_batch=4096,
            scl_scan_chunks=32,
            xla_body_mbps=round(polar["mbps"], 3),
        )
        print(json.dumps(result))
    # NEGATIVE RESULT (r5, retiring the stage): the SSCL fast-node serving
    # mode lost to the exact path at the headline shape once the r4 exact
    # optimizations landed — 420.9 vs 448.6 Mbps (r5 re-measure,
    # results/r5q2.log; r4 driver: 421.8 vs 448.6) and 6.96 vs 12.7 at
    # N=4096 L=32 (polar_n4096_scl32_fast.json).  An approximate mode
    # slower than exact has no serving reason to exist; node_mode="fast"
    # stays available as an opt-in with its own NumPy twin, but the bench
    # no longer spends ~6 min measuring it.  See ARCHITECTURE.md §3f.


if __name__ == "__main__":
    main()
