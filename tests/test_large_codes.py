"""Large-code configurations (BASELINE.json configs[4] / VERDICT r1 #2) at
reduced frame counts: N=4096 SCL-32 polar and n=8192 QC-LDPC BP must
construct, compile, and decode correctly.  Full-scale throughput artifacts
live in results/tpu/ (tools/large_code_runs.py)."""

import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np


def _encode_polar_host(msgs, N, info):
    u = np.zeros((msgs.shape[0], N), np.int64)
    u[:, info] = msgs
    s = 1
    while s < N:
        u = u.reshape(msgs.shape[0], N // (2 * s), 2, s)
        u[:, :, 0, :] ^= u[:, :, 1, :]
        u = u.reshape(msgs.shape[0], N)
        s *= 2
    return u


def test_polar_n4096_scl32_decodes():
    import jax

    from polarcode_and_ldpc_tpu.models.polar.construction import (
        frozen_mask_from_positions,
    )
    from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder

    N, K, L = 4096, 2048, 32
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    fm = frozen_mask_from_positions(N, frozen)
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, (4, K)).astype(np.int8)
    cw = _encode_polar_host(msgs, N, info)
    llr = awgn_llr_np(cw, 3.0, rng.standard_normal((4, N))).astype(np.float32)
    dec = jax.jit(make_scl_decoder(N, fm, L, impl="scan-chunked", chunk=64))
    u_paths, metrics = dec(llr)
    u_np, m_np = np.asarray(u_paths), np.asarray(metrics)
    best = u_np[np.arange(4), np.argmax(m_np, axis=1)][:, info]
    np.testing.assert_array_equal(best, msgs)  # 3 dB: error-free decode
    assert np.isfinite(m_np).sum() >= 4  # live paths carry finite metrics


def test_ldpc_n8192_qc_bp_decodes():
    n, k, z = 8192, 4096, 512
    base = fec.qc_base_matrix(n, k, z, dv=3, dc=6, seed=42)
    H = fec.qc_expand(base, z)
    enc = fec.LDPCEncoder(n, k, H=H)
    dec = fec.QCBPDecoder(base, z, max_iter=20, early_stop=True)
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 2, (8, enc.k)).astype(np.int8)
    cw = ((msgs.astype(np.float32) @ np.asarray(enc.G).astype(np.float32))
          % 2).astype(np.int8)
    assert enc.verify_codeword(cw).all()
    llr = awgn_llr_np(cw, 3.0, rng.standard_normal((8, n))).astype(np.float32)
    bits, iters = dec.decode(llr, return_iterations=True)
    bits = np.asarray(bits)
    np.testing.assert_array_equal(bits[:, enc.info_positions], msgs)
    assert 0 < np.asarray(iters).max() <= 20
