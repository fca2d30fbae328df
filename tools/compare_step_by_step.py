#!/usr/bin/env python
"""Full-trellis step-by-step A/B dump — counterpart of the reference's
``debug_scripts/compare_step_by_step.py:36-44`` (which prints the decoder's
complete L/B matrices position by position and compares against the
``polarcodes`` oracle).

Here the scan-trellis decoder (``models/polar/scl.py`` ``impl="scan"`` — the
formulation that materializes the same (N)×(n+1) L/B state as the reference)
dumps its full per-leaf trellis next to the float64 NumPy twin's, flagging
the first divergent cell (there should be none: bit-exactness is a tested
contract; this tool exists for interactive debugging when it breaks).

Usage: python tools/compare_step_by_step.py [--N 8] [--L 2] [--snr 2.0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=8)
    ap.add_argument("--K", type=int, default=None)
    ap.add_argument("--L", type=int, default=2, help="list size (1 = SC)")
    ap.add_argument("--snr", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        bit_reverse,
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.parity import polar_np

    N = args.N
    K = args.K or N // 2
    n = int(np.log2(N))
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    mask = frozen_mask_from_positions(N, frozen)
    rng = np.random.default_rng(args.seed)
    msg = rng.integers(0, 2, K)
    cw = polar_np.polar_encode_np(msg, N, info)
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    llr = awgn_llr_np(cw[None], args.snr, rng.standard_normal((1, N)))[0]
    print(f"message: {msg}\ncodeword: {cw}\nllr: {np.round(llr, 3)}\n")

    # ---- NumPy twin trellis, leaf by leaf (reference L/B semantics) ------
    # re-run the twin's inner machinery to expose the L/B matrices
    Lm = np.full((N, n + 1), np.nan)
    Bm = np.full((N, n + 1), np.nan)
    Lm[:, 0] = llr
    for i in range(N):
        leaf = bit_reverse(i, n)
        polar_np._update_llrs(Lm, Bm, leaf, n, N)
        Bm[leaf, n] = (0 if mask[leaf]
                       else (0 if Lm[leaf, n] >= 0 else 1))
        polar_np._update_bits(Bm, leaf, n)
        print(f"-- leaf {i} (storage {leaf}, "
              f"{'frozen' if mask[leaf] else 'info'}): "
              f"decision LLR {Lm[leaf, n]:+.6f} → bit {int(Bm[leaf, n])}")
    print("\nNumPy twin L matrix (rows = positions, cols = stages):")
    for p in range(N):
        print(f"  pos {p}: {np.round(Lm[p], 4)}")
    print("twin B matrix:")
    for p in range(N):
        print(f"  pos {p}: {Bm[p]}")
    u_twin = Bm[:, n].astype(np.int64)

    # ---- device decoder (scan-trellis at L=1 ≡ SC, else SCL) -------------
    if args.L == 1:
        from polarcode_and_ldpc_tpu.models.polar.sc import make_sc_decoder

        dec = jax.jit(make_sc_decoder(N, mask, jnp.float64, impl="scan"))
        u_dev = np.asarray(dec(jnp.asarray(llr)[None]))[0]
    else:
        from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder

        dec = jax.jit(make_scl_decoder(N, mask, args.L, jnp.float64,
                                       impl="scan"))
        u_paths, metrics = dec(jnp.asarray(llr)[None])
        u_paths, metrics = np.asarray(u_paths)[0], np.asarray(metrics)[0]
        print(f"\nSCL-{args.L} path metrics: {np.round(metrics, 6)}")
        for p_i, row in enumerate(u_paths):
            print(f"  path {p_i}: u = {row}")
        u_dev = u_paths[int(np.argmax(metrics))]
        _, m_twin, paths_twin = polar_np.scl_decode_np(llr, mask, args.L)
        print(f"twin metrics:             {np.round(m_twin, 6)}")
        same = (u_paths == paths_twin).all() and np.allclose(
            metrics, m_twin, atol=1e-9, equal_nan=True)
        print(f"all paths + metrics match twin: {same}")

    diff = np.nonzero(u_dev != u_twin)[0]
    if diff.size:
        print(f"\nFIRST DIVERGENCE at u position {diff[0]}: "
              f"device {u_dev[diff[0]]} vs twin {u_twin[diff[0]]}")
        return 1
    print(f"\ndevice u == twin u (bit-exact): {u_dev}")
    print(f"decoded message @ info positions: {u_dev[info]} "
          f"(errors: {int((u_dev[info] != msg).sum())})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
