"""Large-code demonstrations (BASELINE.json configs[4] / VERDICT r1 #2):

* n=8192 QC-LDPC BP decode on TPU — roll-based gather-free decoder
* N=4096 SCL-32 polar decode on TPU — chunk-scan compile-light decoder

Each writes a JSON artifact under results/tpu/ with throughput + BER and
the exact configuration.  Inputs are staged host-side (tunnel economics:
compile only the decoder — CLAUDE.md).

Usage:
  python tools/large_code_runs.py ldpc8192 [--batch 512] [--frames 2048]
  python tools/large_code_runs.py polar4096 [--batch 256] [--list 32]
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

OUT_DIR = Path(__file__).resolve().parent.parent / "results" / "tpu"


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _force(x):
    from polarcode_and_ldpc_tpu.sim.throughput import _force as f

    f(x)


def _steady(fn, *args, iters=5):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_ldpc8192(batch: int, frames: int, snr_db: float = 3.0,
                 scan_chunks: int = 16, variant: str = "bp",
                 schedule: str = "flooding",
                 normalization: float = 1.0) -> dict:
    import jax
    import jax.numpy as jnp
    from jax import lax

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    n, k, z = 8192, 4096, 512
    _log("ldpc8192: constructing QC base + systematic G (host) ...")
    t0 = time.perf_counter()
    base = fec.qc_base_matrix(n, k, z, dv=3, dc=6, seed=42)
    H = fec.qc_expand(base, z)
    enc = fec.LDPCEncoder(n, k, H=H)
    t_constr = time.perf_counter() - t0
    _log(f"ldpc8192: construction {t_constr:.1f}s; encoding {batch} frames ...")
    rng = np.random.default_rng(7)
    nb_frames = scan_chunks * batch
    msgs = rng.integers(0, 2, (nb_frames, enc.k)).astype(np.int8)
    cw = (msgs.astype(np.float32) @ np.asarray(enc.G).astype(np.float32))
    cw = (cw % 2).astype(np.int8)
    llr = jnp.asarray(
        awgn_llr_np(cw, snr_db, rng.standard_normal((nb_frames, n)))
        .astype(np.float32))
    dec = fec.QCBPDecoder(base, z, max_iter=20, early_stop=True,
                          variant=variant, normalization=normalization,
                          schedule=schedule)
    # chained on-chip measurement (lax.scan over scan_chunks batches in
    # one dispatched program, errors counted on device) — per-dispatch
    # tunnel round-trips otherwise tax a ~4 ms decode ~2.7x
    llr3 = llr.reshape(scan_chunks, batch, n)
    msgs3 = jnp.asarray(msgs.reshape(scan_chunks, batch, enc.k))
    info_idx = jnp.asarray(enc.info_positions, jnp.int32)

    @jax.jit
    def scan_decode(llrs, m3):
        def step(_, x):
            bits, iters = dec._decode(x["llr"])
            diff = bits[:, info_idx] != x["msg"]
            return None, (jnp.sum(diff, dtype=jnp.int32),
                          jnp.sum(jnp.any(diff, axis=1), dtype=jnp.int32),
                          jnp.sum(iters, dtype=jnp.int32))
        return lax.scan(step, None, {"llr": llrs, "msg": m3})[1]

    _log(f"ldpc8192: compiling QC BP (x{scan_chunks} scan) ...")
    t0 = time.perf_counter()
    be, fe, it = jax.block_until_ready(scan_decode(llr3, msgs3))
    t_compile = time.perf_counter() - t0
    _log(f"ldpc8192: compile+first {t_compile:.1f}s")
    t = _steady(scan_decode, llr3, msgs3, iters=3)
    ber = float(np.asarray(be).sum()) / (nb_frames * enc.k)
    fer = float(np.asarray(fe).sum()) / nb_frames
    out = {
        "config": {"n": n, "k": k, "z": z, "dv": 3, "dc": 6,
                   "decoder": f"qc-{variant}", "schedule": schedule,
                   "normalization": normalization,
                   "max_iter": 20, "snr_db": snr_db, "batch": batch,
                   "scan_chunks": scan_chunks},
        "construction_seconds": t_constr,
        "compile_seconds": t_compile,
        "decode_seconds_per_scan": t,
        "decoded_info_mbps": nb_frames * k / t / 1e6,
        "avg_iterations": float(np.asarray(it).sum()) / nb_frames,
        "ber": ber, "fer": fer,
        "device": str(jax.devices()[0]),
    }
    return out


def run_polar4096(batch: int, list_size: int, snr_db: float = 3.0,
                  chunk: int = 64, body: str = "xla",
                  leaf: str = "onehot", control: str = "split",
                  node_mode: str = "exact",
                  mask_dedup: str = "exact",
                  batch_tile: int = 128,
                  scan_chunks: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    N, K = 4096, 2048
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    fm = frozen_mask_from_positions(N, frozen)
    rng = np.random.default_rng(3)
    nb = max(scan_chunks, 1) * batch
    msgs = rng.integers(0, 2, (nb, K)).astype(np.int8)
    u = np.zeros((nb, N), np.int64)
    u[:, info] = msgs
    s = 1
    while s < N:
        u = u.reshape(nb, N // (2 * s), 2, s)
        u[:, :, 0, :] ^= u[:, :, 1, :]
        u = u.reshape(nb, N)
        s *= 2
    llr_np = awgn_llr_np(u, snr_db,
                         rng.standard_normal((nb, N))).astype(np.float32)
    # stage host->device in <=16 MB slices: the tunnel wedged 5x in r5 on
    # single ~70-134 MB puts (client frozen in tcp_recvmsg), while small
    # transfers never did
    step_rows = max(1, (16 << 20) // (N * 4))
    parts = [jax.device_put(llr_np[i:i + step_rows])
             for i in range(0, nb, step_rows)]
    llr = jnp.concatenate(parts, axis=0)
    jax.block_until_ready(llr)
    _log(f"polar4096: staged {nb}x{N} LLRs in {len(parts)} slices")
    dec = jax.jit(make_scl_decoder(N, fm, list_size, impl="scan-chunked",
                                   chunk=chunk, body_impl=body,
                                   leaf_impl=leaf, control_impl=control,
                                   node_mode=node_mode,
                                   mask_dedup=mask_dedup,
                                   batch_tile=batch_tile))
    _log(f"polar4096: compiling SCL-{list_size} (chunk={chunk}"
         + (f", x{scan_chunks} scan" if scan_chunks else "") + ") ...")
    if scan_chunks:
        # chained on-chip measurement with on-device error counting — the
        # flagship headline's methodology (bench.bench_polar_scl8): the
        # dispatch round-trip otherwise serializes with compute
        from jax import lax

        llr3 = llr.reshape(scan_chunks, batch, N)
        msgs3 = jnp.asarray(msgs.reshape(scan_chunks, batch, K))
        info_idx = jnp.asarray(info, jnp.int32)

        @jax.jit
        def scan_decode(llrs, m3):
            def step(_, x):
                up, m = dec(x["llr"])
                sel = jnp.argmax(m, axis=1)
                bst = jnp.take_along_axis(
                    up, sel[:, None, None], axis=1)[:, 0, :]
                diff = bst[:, info_idx] != x["msg"]
                return None, (jnp.sum(diff, dtype=jnp.int32),
                              jnp.sum(jnp.any(diff, axis=1),
                                      dtype=jnp.int32))
            return lax.scan(step, None, {"llr": llrs, "msg": m3})[1]

        t0 = time.perf_counter()
        be, fe = jax.block_until_ready(scan_decode(llr3, msgs3))
        t_compile = time.perf_counter() - t0
        _log(f"polar4096: compile+first {t_compile:.1f}s")
        t = _steady(scan_decode, llr3, msgs3, iters=3) / scan_chunks
        ber = float(np.asarray(be).sum()) / (nb * K)
        fer = float(np.asarray(fe).sum()) / nb
    else:
        t0 = time.perf_counter()
        u_paths, metrics = jax.block_until_ready(dec(llr))
        t_compile = time.perf_counter() - t0
        _log(f"polar4096: compile+first {t_compile:.1f}s")
        t = _steady(dec, llr, iters=3)
        u_np, m_np = np.asarray(u_paths), np.asarray(metrics)
        best = u_np[np.arange(batch), np.argmax(m_np, axis=1)][:, info]
        ber = float((best != msgs).mean())
        fer = float((best != msgs).any(1).mean())
    return {
        "config": {"N": N, "K": K, "list_size": list_size, "decoder": "scl",
                   "impl": "scan-chunked", "chunk": chunk, "snr_db": snr_db,
                   "batch": batch, "body_impl": body, "leaf_impl": leaf,
                   "control_impl": control, "node_mode": node_mode,
                   "mask_dedup": mask_dedup, "batch_tile": batch_tile,
                   "scan_chunks": scan_chunks},
        "compile_seconds": t_compile,
        "decode_seconds_per_batch": t,
        "decoded_info_mbps": batch * K / t / 1e6,
        "ber": ber, "fer": fer,
        "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["ldpc8192", "polar4096"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--list", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--body", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--leaf", default="onehot", choices=["onehot", "sort"])
    ap.add_argument("--control", default="split",
                    choices=["split", "fused", "kernel", "unroll-fused",
                             "unroll-kernel"])
    ap.add_argument("--node-mode", default="exact", choices=["exact", "fast"])
    ap.add_argument("--mask-dedup", default="exact", choices=["exact", "union"])
    ap.add_argument("--batch-tile", type=int, default=128)
    ap.add_argument("--scan-chunks", type=int, default=0,
                    help="chain this many batches on-chip per dispatch "
                         "(the flagship headline methodology); 0 = "
                         "single-dispatch")
    ap.add_argument("--variant", default="bp",
                    choices=["bp", "ms", "nms", "oms"])
    ap.add_argument("--schedule", default="flooding",
                    choices=["flooding", "layered"])
    ap.add_argument("--normalization", type=float, default=1.0)
    ap.add_argument("--snr-db", type=float, default=3.0)
    ap.add_argument("--out-name", default=None,
                    help="artifact filename override (results/tpu/<name>)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    if args.which == "ldpc8192":
        out = run_ldpc8192(args.batch or 512, args.frames,
                           snr_db=args.snr_db, variant=args.variant,
                           schedule=args.schedule,
                           normalization=args.normalization)
        path = OUT_DIR / "ldpc_n8192_qc_bp.json"
    else:
        out = run_polar4096(args.batch or 256, args.list, chunk=args.chunk,
                            body=args.body, leaf=args.leaf,
                            control=args.control, node_mode=args.node_mode,
                            mask_dedup=args.mask_dedup,
                            batch_tile=args.batch_tile,
                            scan_chunks=args.scan_chunks)
        path = OUT_DIR / "polar_n4096_scl32.json"
    if args.out_name:
        path = OUT_DIR / args.out_name
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
