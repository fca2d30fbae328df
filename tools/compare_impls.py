#!/usr/bin/env python
"""Same-input A/B across every decoder implementation (reference
``debug_scripts/compare_decoders_same_input.py`` / ``compare_step_by_step.py``):
unrolled vs scan vs NumPy twin for SC/SCL; XLA gather vs matmul-permute vs
Pallas-interpret for BP.

Usage: python tools/compare_impls.py [--N 64] [--L 4]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.construction import frozen_mask_from_positions
    from polarcode_and_ldpc_tpu.models.polar.sc import make_sc_decoder
    from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder
    from polarcode_and_ldpc_tpu.ops.bp_pallas import make_bp_decoder_pallas
    from polarcode_and_ldpc_tpu.parity.ldpc_np import bp_decode_np
    from polarcode_and_ldpc_tpu.parity.polar_np import sc_decode_np, scl_decode_np

    N, L = args.N, args.L
    rng = np.random.default_rng(0)
    frozen, _ = fec.construct_polar_code(N, N // 2)
    mask = frozen_mask_from_positions(N, frozen)
    llr = rng.standard_normal((args.frames, N)) * 1.5
    fail = 0

    sc_u = np.asarray(jax.jit(make_sc_decoder(N, mask, jnp.float64, impl="unrolled"))(llr))
    sc_s = np.asarray(jax.jit(make_sc_decoder(N, mask, jnp.float64, impl="scan"))(llr))
    sc_np = np.stack([sc_decode_np(l, mask) for l in llr])
    print(f"SC  unrolled==scan: {(sc_u == sc_s).all()}  ==numpy: {(sc_u == sc_np).all()}")
    fail += not ((sc_u == sc_s).all() and (sc_u == sc_np).all())

    u_u, m_u = jax.jit(make_scl_decoder(N, mask, L, jnp.float64, impl="unrolled"))(llr)
    u_s, m_s = jax.jit(make_scl_decoder(N, mask, L, jnp.float64, impl="scan"))(llr)
    ok_paths = (np.asarray(u_u) == np.asarray(u_s)).all()
    ok_np = all(
        (np.asarray(u_u)[i] == scl_decode_np(llr[i], mask, L)[2]).all()
        for i in range(args.frames))
    print(f"SCL unrolled==scan: {ok_paths}  ==numpy: {ok_np}")
    fail += not (ok_paths and ok_np)

    H = fec.regular_construction(96, 48, 3, 6, seed=3)
    llr_l = (rng.standard_normal((32, 96)) * 2).astype(np.float32)
    bx, ix = fec.BPDecoder(H, max_iter=10).decode(llr_l, return_iterations=True)
    bp, ip = make_bp_decoder_pallas(
        fec.BPDecoder(H, max_iter=10).graph, max_iter=10, batch_tile=32,
        interpret=True)(jnp.asarray(llr_l))
    ok_pallas = ((np.asarray(bx) == np.asarray(bp)).all()
                 and (np.asarray(ix) == np.asarray(ip)).all())
    ref = [bp_decode_np(H, l.astype(np.float64), max_iter=10) for l in llr_l[:4]]
    ok_np_bp = all((np.asarray(bx)[i] == ref[i][0]).all() for i in range(4))
    print(f"BP  xla==pallas: {ok_pallas}  ==numpy(f64, first 4): {ok_np_bp}")
    fail += not ok_pallas

    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
