"""LDPC: matrix construction, GF(2) encoding, BP/MS decoder parity with the
NumPy twins (reference ``src/ldpc/``)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.models.ldpc.utils import (
    calculate_syndrome,
    check_syndrome,
    count_errors,
    hamming_distance,
)
from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np
from polarcode_and_ldpc_tpu.parity.ldpc_np import bp_decode_np, ms_decode_np


# -- matrices -----------------------------------------------------------------

def test_mackay_construction_properties():
    H = fec.mackay_construction(48, 24, dv=3, dc=6, seed=0)
    assert H.shape == (24, 48)
    np.testing.assert_array_equal(H.sum(axis=0), 3)  # exact column degree


def test_generate_ldpc_matrix_methods():
    for method in ("mackay", "peg", "random"):
        H = fec.generate_ldpc_matrix(48, 24, method=method, dv=3, dc=6, seed=1)
        assert H.shape == (24, 48)
        assert H.sum() > 0


def test_generate_gallager_banded():
    # the pyldpc-algorithm banded construction (oracle differential showed
    # a better error floor than "regular" at n=504) — exact (3,6) degrees
    H = fec.generate_ldpc_matrix(48, 24, method="gallager", dv=3, dc=6,
                                 seed=1)
    assert H.shape == (24, 48)
    np.testing.assert_array_equal(H.sum(axis=0), 3)
    np.testing.assert_array_equal(H.sum(axis=1), 6)
    enc = fec.LDPCEncoder(48, 24, H=H)
    msgs = np.random.default_rng(2).integers(0, 2, (16, enc.k))
    assert enc.verify_codeword(np.asarray(enc.encode(msgs))).all()


def test_generate_regular_falls_back_when_impossible():
    # n=1008, k=675 → m=333 does not divide dv·n: exact regularity is
    # impossible; the dispatcher must fall back to mackay instead of
    # raising (the reference adjusts and proceeds, matrix.py:74-78)
    H = fec.generate_ldpc_matrix(1008, 675, method="regular", dv=3, dc=6)
    assert H.shape == (333, 1008)
    np.testing.assert_array_equal(H.sum(axis=0), 3)  # column degree kept


def test_peg_construction_vectorized_and_fast():
    # selection order must equal the reference's per-edge argmin
    # (matrix.py:94-132: least-loaded check, ties to lowest index)
    def peg_ref(n, k, dv):
        m = n - k
        H = np.zeros((m, n), dtype=np.int64)
        for col in range(n):
            selected = []
            for _ in range(dv):
                row_sums = H.sum(axis=1)
                available = [i for i in range(m) if i not in selected]
                if not available:
                    break
                best = min(available, key=lambda i: row_sums[i])
                selected.append(best)
                H[best, col] = 1
        return H

    for n, k, dv in [(60, 30, 3), (48, 24, 5), (20, 16, 6)]:
        np.testing.assert_array_equal(fec.peg_construction(n, k, dv),
                                      peg_ref(n, k, dv))
    # scale: n=8192 must construct in seconds, not minutes (VERDICT r1 #10)
    import time

    t0 = time.time()
    H = fec.peg_construction(8192, 4096, 3)
    assert time.time() - t0 < 30
    np.testing.assert_array_equal(H.sum(axis=0), 3)


def test_systematic_generator_orthogonal():
    H = fec.mackay_construction(48, 24, dv=3, dc=6, seed=2)
    G, Hs = fec.create_systematic_generator(H)
    if G is not None:
        assert ((G @ Hs.T) % 2 == 0).all()


def test_gf2_rank():
    H = np.array([[1, 0, 1], [0, 1, 1], [1, 1, 0]])  # row3 = row1+row2 over GF(2)
    assert fec.gf2_rank(H) == 2
    assert fec.check_matrix_rank(np.eye(4, dtype=int)) == 4


def test_girth_detects_4_cycle():
    H4 = np.array([[1, 1, 0], [1, 1, 0]])  # vars 0,1 share checks 0,1 → 4-cycle
    assert fec.calculate_girth(H4) == 4
    # a tree (no cycles) → infinity (returned as 0 or large sentinel per API)
    Ht = np.array([[1, 1, 0], [0, 0, 1]])
    g = fec.calculate_girth(Ht)
    assert g == 0 or g > 48


# -- encoder --------------------------------------------------------------------

@pytest.mark.parametrize("n,k", [(48, 24), (96, 48)])
def test_encoder_codewords_satisfy_H(n, k, rng):
    enc = fec.LDPCEncoder(n, k, dv=3, dc=6, seed=42)
    msgs = rng.integers(0, 2, (20, enc.k))
    cw = np.asarray(enc.encode(msgs))
    assert ((enc.H @ cw.T) % 2 == 0).all()
    # systematic: message recoverable
    back = np.asarray(enc.extract_message(cw))
    np.testing.assert_array_equal(back, msgs)


def test_encoder_from_explicit_H(rng):
    H = fec.mackay_construction(48, 24, dv=3, dc=6, seed=9)
    enc = fec.LDPCEncoder(48, 24, H=H)
    msgs = rng.integers(0, 2, (8, enc.k))
    cw = np.asarray(enc.encode(msgs))
    assert ((H @ cw.T) % 2 == 0).all()
    assert enc.verify_codeword(cw[0])


def test_encoder_rate():
    enc = fec.LDPCEncoder(48, 24, dv=3, dc=6, seed=0)
    assert abs(enc.get_code_rate() - enc.k / 48) < 1e-12
    assert enc.get_parity_check_matrix().shape == (24, 48)


# -- decoders ---------------------------------------------------------------------

def _small_code(seed=4):
    enc = fec.LDPCEncoder(24, 12, dv=3, dc=6, seed=seed)
    return enc


def test_bp_bit_exact_parity(rng):
    enc = _small_code()
    dec = fec.BPDecoder(enc.H, max_iter=15, dtype=jnp.float64)
    msgs = rng.integers(0, 2, (12, enc.k))
    cw = np.asarray(enc.encode(msgs))
    noise = rng.standard_normal(cw.shape)
    llr = awgn_llr_np(cw, 2.0, noise)
    bits, iters = dec.decode(llr, return_iterations=True)
    bits, iters = np.asarray(bits), np.asarray(iters)
    for i in range(len(msgs)):
        ref_bits, ref_iters = bp_decode_np(enc.H, llr[i], max_iter=15)
        np.testing.assert_array_equal(bits[i], ref_bits, err_msg=f"frame {i}")
        assert iters[i] == ref_iters, f"frame {i}: {iters[i]} vs {ref_iters}"


@pytest.mark.parametrize("norm,offset", [(1.0, 0.0), (0.75, 0.0), (1.0, 0.5)])
def test_minsum_bit_exact_parity(norm, offset, rng):
    enc = _small_code(seed=6)
    dec = fec.MSDecoder(enc.H, max_iter=10, normalization=norm, offset=offset,
                        dtype=jnp.float64)
    msgs = rng.integers(0, 2, (10, enc.k))
    cw = np.asarray(enc.encode(msgs))
    noise = rng.standard_normal(cw.shape)
    llr = awgn_llr_np(cw, 2.0, noise)
    bits, iters = dec.decode(llr, return_iterations=True)
    bits, iters = np.asarray(bits), np.asarray(iters)
    for i in range(len(msgs)):
        ref_bits, ref_iters = ms_decode_np(enc.H, llr[i], max_iter=10,
                                           normalization=norm, offset=offset)
        np.testing.assert_array_equal(bits[i], ref_bits, err_msg=f"frame {i}")
        assert iters[i] == ref_iters


def test_bp_no_early_stop_runs_full(rng):
    enc = _small_code(seed=7)
    dec = fec.BPDecoder(enc.H, max_iter=5, early_stop=False)
    llr = rng.standard_normal((4, 24)) * 2
    _, iters = dec.decode(llr, return_iterations=True)
    assert (np.asarray(iters) == 5).all()


def test_bp_noiseless_converges_fast(rng):
    enc = _small_code(seed=8)
    dec = fec.BPDecoder(enc.H, max_iter=20)
    msgs = rng.integers(0, 2, (6, enc.k))
    cw = np.asarray(enc.encode(msgs))
    llr = (1.0 - 2.0 * cw) * 100.0
    bits, iters = dec.decode(llr, return_iterations=True)
    np.testing.assert_array_equal(np.asarray(bits), cw)
    assert (np.asarray(iters) == 1).all()


def test_nms_oms_wrappers(rng):
    enc = _small_code(seed=10)
    nms = fec.NMSDecoder(enc.H, max_iter=10, normalization=0.75)
    oms = fec.OMSDecoder(enc.H, max_iter=10, offset=0.5)
    llr = rng.standard_normal((3, 24)) * 3
    assert np.asarray(nms.decode(llr)).shape == (3, 24)
    assert np.asarray(oms.decode(llr)).shape == (3, 24)


def test_decoder_e2e_moderate_snr(rng):
    # full chain at realistic size (reference config n=504 shrunk for test speed)
    enc = fec.LDPCEncoder(120, 60, dv=3, dc=6, seed=42)
    dec = fec.BPDecoder(enc.H, max_iter=20)
    chan = fec.AWGNChannel(snr_db=4.0, seed=1)
    msgs = rng.integers(0, 2, (50, enc.k))
    cw = enc.encode(msgs)
    out = np.asarray(le_extract(enc, dec.decode(chan.transmit(cw))))
    assert (out != msgs).mean() < 0.01


def le_extract(enc, bits):
    return enc.extract_message(bits)


# -- utils ------------------------------------------------------------------------

def test_ldpc_utils(rng):
    H = fec.mackay_construction(24, 12, dv=3, dc=6, seed=3)
    enc = fec.LDPCEncoder(24, 12, H=H)
    cw = np.asarray(enc.encode(rng.integers(0, 2, enc.k)))
    assert check_syndrome(H, cw)
    assert (calculate_syndrome(H, cw) == 0).all()
    bad = cw.copy()
    bad[0] ^= 1
    assert not check_syndrome(H, bad)
    assert count_errors(cw, bad) == 1
    assert hamming_distance(cw, bad) == 1


def test_qc_ldpc_construction(rng):
    H = fec.qc_ldpc_construction(96, 48, z=8, dv=3, dc=6, seed=5)
    assert H.shape == (48, 96)
    np.testing.assert_array_equal(H.sum(axis=0), 3)  # regular, by lift
    np.testing.assert_array_equal(H.sum(axis=1), 6)
    # circulant blocks: each z x z block is all-zero or a cyclic permutation
    z = 8
    for bi in range(48 // z):
        for bj in range(96 // z):
            blk = H[bi * z:(bi + 1) * z, bj * z:(bj + 1) * z]
            assert blk.sum() in (0, z)
            if blk.sum() == z:
                assert (blk.sum(axis=0) == 1).all() and (blk.sum(axis=1) == 1).all()
    enc = fec.LDPCEncoder(96, 48, H=H)
    cw = np.asarray(enc.encode(rng.integers(0, 2, (8, enc.k))))
    assert ((H @ cw.T) % 2 == 0).all()
    dec = fec.BPDecoder(H, max_iter=20)
    chan = fec.AWGNChannel(snr_db=4.0, seed=3)
    msgs = rng.integers(0, 2, (64, enc.k))
    out = np.asarray(dec.decode(chan.transmit(enc.encode(msgs))))
    assert (out[:, enc.info_positions] != msgs).mean() < 0.02
