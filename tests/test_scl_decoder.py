"""SCL / CA-SCL decoders: parity with the NumPy twin, SC equivalence at L=1,
and CRC-aided selection (the reference's documented gap,
``docs/SCL_DECODER_README.md:67``). Mirrors the intent of the reference's
``tests/test_scl_decoder.py`` but with real asserts (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np
from polarcode_and_ldpc_tpu.models.polar.construction import (
    frozen_mask_from_positions,
)
from polarcode_and_ldpc_tpu.parity.polar_np import polar_encode_np, scl_decode_np


@pytest.mark.parametrize("N,K,L", [(16, 8, 2), (32, 16, 4), (64, 32, 8)])
def test_scl_parity_with_numpy(N, K, L, rng):
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    dec = fec.SCLDecoder(N, K, list_size=L, frozen_bits=frozen, dtype=jnp.float64)
    frames = 8
    msgs = rng.integers(0, 2, (frames, K))
    noise = rng.standard_normal((frames, N))
    cw = np.stack([polar_encode_np(m, N, info) for m in msgs])
    llr = awgn_llr_np(cw, 1.0, noise)
    u_paths, metrics = dec.decode_paths(llr)
    u_paths, metrics = np.asarray(u_paths), np.asarray(metrics)
    for i in range(frames):
        ref_best, ref_metrics, ref_paths = scl_decode_np(llr[i], dec.frozen_mask, L)
        np.testing.assert_allclose(metrics[i], ref_metrics, rtol=1e-9, atol=1e-9,
                                   err_msg=f"frame {i} metrics")
        np.testing.assert_array_equal(u_paths[i], ref_paths, err_msg=f"frame {i} paths")
        best_dev = np.asarray(dec.decode(llr[i : i + 1]))[0]
        np.testing.assert_array_equal(best_dev, ref_best[info])


def test_scl_list1_equals_sc(rng):
    # reference edge case: L=1 SCL ≡ SC (tests/test_scl_decoder.py:118-137)
    N, K = 64, 32
    frozen, _ = fec.construct_polar_code(N, K)
    sc = fec.SCDecoder(N, K, frozen_bits=frozen, dtype=jnp.float64)
    scl = fec.SCLDecoder(N, K, list_size=1, frozen_bits=frozen, dtype=jnp.float64)
    llr = rng.standard_normal((20, N)) * 3.0
    np.testing.assert_array_equal(np.asarray(sc.decode(llr)), np.asarray(scl.decode(llr)))


def test_scl_improves_with_list_size(rng):
    # larger L can only find equal-or-better metric paths; check FER ordering
    # statistically (reference tests/test_scl_decoder.py:51-110 intent)
    N, K, snr = 64, 32, 0.5
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen)
    chan = fec.AWGNChannel(snr_db=snr, seed=3)
    msgs = rng.integers(0, 2, (400, K))
    llr = chan.transmit(enc.encode(msgs))
    fer = {}
    for L in (1, 8):
        dec = fec.SCLDecoder(N, K, list_size=L, frozen_bits=frozen)
        out = np.asarray(dec.decode(llr))
        fer[L] = np.any(out != msgs, axis=1).mean()
    assert fer[8] <= fer[1]


def test_cascl_selects_crc_valid_path(rng):
    N, K = 128, 64
    frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen, use_crc=True)
    dec = fec.CASCLDecoder(N, K, list_size=8, frozen_bits=frozen)
    msgs = rng.integers(0, 2, (100, enc.K_data))
    chan = fec.AWGNChannel(snr_db=2.5, seed=11)
    out = np.asarray(dec.decode(chan.transmit(enc.encode(msgs))))
    assert out.shape == (100, K)
    # every returned path's info bits either pass CRC or no path passed
    data, crc = out[:, : enc.K_data], out[:, enc.K_data :]
    from polarcode_and_ldpc_tpu.parity.polar_np import crc_check_np
    n_pass = sum(crc_check_np(np.concatenate([d, c])) for d, c in zip(data, crc))
    assert n_pass >= 95  # at 2.5 dB nearly all frames decode to a CRC-valid path


def test_cascl_beats_plain_scl(rng):
    # CRC-aided selection should not be worse than metric-argmax selection
    N, K, snr = 128, 64, 1.0
    frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen, use_crc=True)
    msgs = rng.integers(0, 2, (300, enc.K_data))
    chan = fec.AWGNChannel(snr_db=snr, seed=5)
    llr = chan.transmit(enc.encode(msgs))
    plain = fec.SCLDecoder(N, K, list_size=8, frozen_bits=frozen)
    ca = fec.CASCLDecoder(N, K, list_size=8, frozen_bits=frozen)
    fer_plain = np.any(np.asarray(plain.decode(llr))[:, : enc.K_data] != msgs, axis=1).mean()
    fer_ca = np.any(np.asarray(ca.decode(llr))[:, : enc.K_data] != msgs, axis=1).mean()
    assert fer_ca <= fer_plain + 1e-9


def test_scl_all_zero_high_snr():
    # reference edge case (tests/test_scl_decoder.py:139-156)
    N, K = 64, 32
    dec = fec.SCLDecoder(N, K, list_size=4)
    llr = np.full((3, N), 80.0)
    assert (np.asarray(dec.decode(llr)) == 0).all()


def test_live_width_bit_identical(rng):
    # live-width (incremental-list) decoding (round 5): the early chunks
    # run at the actual live path count with NO -inf phantom rows; outputs
    # (slot order and metrics included) must be bit-identical to the
    # full-width program and the NumPy twin for finite LLRs
    import jax
    import jax.numpy as jnp

    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )
    from polarcode_and_ldpc_tpu.parity.polar_np import scl_decode_np

    N, K, L, S = 256, 128, 8, 32
    mask = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = rng.standard_normal((4, N)) * 1.5
    llr[0, :4] = 0.0  # tie stress
    d_leg = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=S, dtype=jnp.float64, perm_impl="rank",
        control_impl="unroll-fused", live_width=False))
    d_liv = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=S, dtype=jnp.float64, perm_impl="rank",
        control_impl="unroll-fused", live_width=True))
    u0, m0 = d_leg(llr)
    u1, m1 = d_liv(llr)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    _, rm, rp = scl_decode_np(llr[2], mask, L)
    np.testing.assert_allclose(np.asarray(m1)[2], rm, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(u1)[2], rp)


def test_live_width_growth_across_chunks_and_pad(rng):
    # growth spanning multiple chunks (L=16 with a sparse head) and the
    # tiny-K output pad (fewer info leaves than log2 L: the missing slots
    # are the phantom rows' exact values - all-zero u, -inf metric)
    import jax
    import jax.numpy as jnp

    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )

    N, L, S = 256, 16, 32
    mask = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, 60, "bhattacharyya", 2.0)[0])
    llr = rng.standard_normal((3, N)) * 1.5
    d_leg = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=S, dtype=jnp.float64, perm_impl="rank",
        control_impl="unroll-fused", live_width=False))
    d_liv = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=S, dtype=jnp.float64, perm_impl="rank",
        control_impl="unroll-fused", live_width=True))
    u0, m0 = d_leg(llr)
    u1, m1 = d_liv(llr)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    # tiny-K pad: 2 info leaves, L=8 -> only 4 live slots at the end
    mask2 = np.ones(64, bool)
    mask2[[62, 63]] = False
    llr2 = rng.standard_normal((2, 64))
    d_p = jax.jit(make_scl_decoder_scan(
        64, mask2, 8, chunk=16, dtype=jnp.float64, perm_impl="rank",
        control_impl="unroll-fused", live_width=True))
    d_pl = jax.jit(make_scl_decoder_scan(
        64, mask2, 8, chunk=16, dtype=jnp.float64, perm_impl="rank",
        control_impl="unroll-fused", live_width=False))
    up, mp = d_p(llr2)
    ul, ml = d_pl(llr2)
    np.testing.assert_array_equal(np.asarray(up), np.asarray(ul))
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(ml))
    assert np.all(np.asarray(mp)[:, 4:] == -np.inf)
