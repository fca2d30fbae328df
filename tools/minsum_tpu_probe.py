#!/usr/bin/env python
"""Measure the fused Pallas min-sum kernel on the real TPU.

Stages (each prints as it lands, so a tunnel stall loses only the tail):
  1. hardware bit-exactness: Pallas MS/NMS/OMS vs the XLA min-sum decoder
     on identical LLRs (n=504 regular code).
  2. chained throughput A/B (same methodology as bench.bench_ldpc_bp):
     scan-of-16 on-chip decode with on-device BER count, XLA vs Pallas.

Reference min-sum semantics: ``src/ldpc/decoder.py:257-355``.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _awgn_llrs_host(cw: np.ndarray, snr_db: float, seed: int) -> np.ndarray:
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    noise = np.random.default_rng(seed).standard_normal(cw.shape)
    return awgn_llr_np(cw, snr_db, noise).astype(np.float32)


def main() -> int:
    import jax
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.ldpc.minsum import (
        MSDecoder, NMSDecoder, OMSDecoder)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    n, k, snr_db = 504, 252, 3.0
    enc = fec.LDPCEncoder(n, k, dv=3, dc=6, seed=42)

    # --- stage 1: hardware bit-exactness, all three variants -------------
    rng = np.random.default_rng(7)
    msgs = rng.integers(0, 2, (512, enc.k)).astype(np.int8)
    cw = (msgs.astype(np.int64) @ np.asarray(enc.G)) % 2
    llr = jnp.asarray(_awgn_llrs_host(cw, snr_db, seed=9))
    for name, ctor in (("MS", lambda impl: MSDecoder(enc.H, max_iter=20, impl=impl)),
                       ("NMS", lambda impl: NMSDecoder(enc.H, max_iter=20, impl=impl)),
                       ("OMS", lambda impl: OMSDecoder(enc.H, max_iter=20, impl=impl))):
        dx = ctor("xla")
        dp = ctor("auto")
        t0 = time.time()
        bx, ix = dx.decode(llr, return_iterations=True)
        bp_, ip_ = dp.decode(llr, return_iterations=True)
        bits_eq = bool((np.asarray(bx) == np.asarray(bp_)).all())
        iters_eq = bool((np.asarray(ix) == np.asarray(ip_)).all())
        print(f"stage1 {name}: impl={dp.impl} bits_eq={bits_eq} "
              f"iters_eq={iters_eq} ({time.time()-t0:.1f}s)", flush=True)
        if dp.impl != "pallas" or not (bits_eq and iters_eq):
            return 1

    # --- stage 2: chained throughput A/B (bench harness) ------------------
    # reuses bench.bench_ldpc_bp verbatim so methodology fixes propagate
    import bench

    for impl in ("auto", "xla"):
        r = bench.bench_ldpc_bp(decoder="nms", impl=impl)
        print(f"stage2 NMS {r['bp_impl']}: {r['mbps']:.1f} Mbps "
              f"({r['seconds_per_batch']*1e3:.2f} ms / "
              f"{r['batch'] * r['scan_chunks']} frames), "
              f"BER@3dB {r['ber_3db']:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
