"""Quasi-cyclic LDPC: base/expand consistency and the roll-based BP fast
path (``models/ldpc/qc.py``) — must decode bit-identically to the generic
padded-edge decoder on the same H (reference BP semantics,
``src/ldpc/decoder.py:11-205``)."""

import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.models.ldpc.matrix import (
    qc_base_matrix,
    qc_expand,
    qc_ldpc_construction,
)
from polarcode_and_ldpc_tpu.models.ldpc.qc import QCBPDecoder


def _llr(n, frames=16, seed=1, scale=3.0):
    return (np.random.default_rng(seed).standard_normal((frames, n))
            * scale).astype(np.float32)


def test_qc_base_expand_matches_construction():
    # qc_ldpc_construction must remain byte-identical to base→expand (same
    # RNG draw order), so existing seeds keep producing the same codes
    for seed in (0, 5, 42):
        base = qc_base_matrix(96, 48, 8, dv=3, dc=6, seed=seed)
        np.testing.assert_array_equal(qc_expand(base, 8),
                                      qc_ldpc_construction(96, 48, 8, 3, 6,
                                                           seed=seed))


def test_qc_expand_structure():
    base = qc_base_matrix(96, 48, 8, dv=3, dc=6, seed=7)
    H = qc_expand(base, 8)
    assert H.shape == (48, 96)
    np.testing.assert_array_equal(H.sum(axis=0), 3)  # column degree dv
    np.testing.assert_array_equal(H.sum(axis=1), 6)  # row degree dc


@pytest.mark.parametrize("n,k,z", [(96, 48, 8), (96, 48, 12), (384, 192, 32)])
def test_qc_bp_bit_identical_to_generic(n, k, z):
    base = qc_base_matrix(n, k, z, dv=3, dc=6, seed=5)
    H = qc_expand(base, z)
    gen = fec.BPDecoder(H, max_iter=15, early_stop=True)
    qc = QCBPDecoder(base, z, max_iter=15, early_stop=True)
    llr = _llr(n)
    bg, ig = gen.decode(llr, return_iterations=True)
    bq, iq = qc.decode(llr, return_iterations=True)
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(bq))
    np.testing.assert_array_equal(np.asarray(ig), np.asarray(iq))


def test_qc_minsum_variants_bit_identical():
    n, k, z = 96, 48, 8
    base = qc_base_matrix(n, k, z, dv=3, dc=6, seed=5)
    H = qc_expand(base, z)
    llr = _llr(n)
    for variant, kwargs, ref in [
        ("nms", dict(normalization=0.75),
         fec.MSDecoder(H, max_iter=15, normalization=0.75)),
        ("oms", dict(offset=0.5),
         fec.MSDecoder(H, max_iter=15, offset=0.5)),
    ]:
        qc = QCBPDecoder(base, z, max_iter=15, variant=variant, **kwargs)
        np.testing.assert_array_equal(np.asarray(ref.decode(llr)),
                                      np.asarray(qc.decode(llr)), err_msg=variant)


def test_qc_bp_no_early_stop():
    n, k, z = 96, 48, 8
    base = qc_base_matrix(n, k, z, dv=3, dc=6, seed=5)
    H = qc_expand(base, z)
    gen = fec.BPDecoder(H, max_iter=8, early_stop=False)
    qc = QCBPDecoder(base, z, max_iter=8, early_stop=False)
    llr = _llr(n, scale=1.0)  # noisier: exercise non-converged frames
    np.testing.assert_array_equal(np.asarray(gen.decode(llr)),
                                  np.asarray(qc.decode(llr)))


def test_qc_irregular_base_rejected():
    base = qc_base_matrix(96, 48, 8, dv=3, dc=6, seed=5).copy()
    base[0, np.nonzero(base[0] >= 0)[0][0]] = -1  # break row regularity
    with pytest.raises(AssertionError):
        QCBPDecoder(base, 8)


def test_qc_pipeline_end_to_end():
    from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_ldpc_pipeline

    n, k, z = 96, 48, 8
    base = qc_base_matrix(n, k, z, dv=3, dc=6, seed=5)
    enc = fec.LDPCEncoder(n, k, H=qc_expand(base, z))
    step = make_ldpc_pipeline(enc.H, enc.G, 4.0, decoder="bp", max_iter=20,
                              message_idx=enc.info_positions,
                              qc_base=base, z=z)
    res = MonteCarloSimulator(step, enc.k, chunk_frames=64).run(128, seed=2)
    assert res.frames == 128
    assert 0 < res.avg_iterations <= 20
    assert res.ber < 0.05


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (8, 1)])
def test_qc_bp_code_sharded_bit_identical(mesh_shape):
    # model parallelism (SURVEY §2.6 stretch): the codeword axis shards
    # over a 2-D (frames, code) mesh; GSPMD turns the z-lane rotations
    # into collective-permutes.  Placement must never change results —
    # every mesh shape decodes bit-identically to one device.
    import jax

    from polarcode_and_ldpc_tpu.models.ldpc.qc import make_qc_bp_decoder
    from polarcode_and_ldpc_tpu.parallel import code_sharded_decode, mesh_2d

    n, k, z = 384, 192, 32  # nb=12: n divisible by every code-axis size
    base = qc_base_matrix(n, k, z, dv=3, dc=6, seed=5)
    dec = make_qc_bp_decoder(base, z, max_iter=12, early_stop=True)
    llr = _llr(n, scale=1.0, seed=3)  # noisy: non-trivial iteration counts
    bits_ref, iters_ref = jax.jit(dec)(llr)
    sharded = code_sharded_decode(dec, mesh_2d(*mesh_shape))
    bits, iters = sharded(llr)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits_ref))
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(iters_ref))


def test_qc_bp_code_sharded_inserts_collectives():
    # the point of the 2-D mesh is communication over ICI, not all-gather
    # back to one chip: the partitioned HLO must contain collective
    # permutes (the sharded-lane rotations)
    from polarcode_and_ldpc_tpu.models.ldpc.qc import make_qc_bp_decoder
    from polarcode_and_ldpc_tpu.parallel import code_sharded_decode, mesh_2d

    n, k, z = 384, 192, 32
    base = qc_base_matrix(n, k, z, dv=3, dc=6, seed=5)
    dec = make_qc_bp_decoder(base, z, max_iter=4, early_stop=False)
    txt = code_sharded_decode(dec, mesh_2d(1, 8)).lower(
        np.zeros((8, n), np.float32)).compile().as_text()
    assert "collective-permute" in txt
