"""Adaptive CA-SCL: SC-first with list fallback (production-serving decoder;
no reference counterpart)."""

import jax.numpy as jnp
import numpy as np

import polarcode_and_ldpc_tpu as fec


def _setup(N=128, K=64, L=4):
    frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen, use_crc=True)
    ada = fec.AdaptiveCASCLDecoder(N, K, list_size=L, frozen_bits=frozen,
                                   fallback_batch=16)
    ca = fec.CASCLDecoder(N, K, list_size=L, frozen_bits=frozen)
    return enc, ada, ca


def test_adaptive_semantics(rng):
    # SC-passing frames return the SC result; failing frames return CA-SCL's
    enc, ada, ca = _setup()
    chan = fec.AWGNChannel(snr_db=-1.0, seed=5)
    msgs = rng.integers(0, 2, (200, enc.K_data))
    llr = chan.transmit(enc.encode(msgs))
    out, stats = ada.decode(llr, return_stats=True)
    assert 0 < stats["sc_passed"] < 200  # both paths exercised at -1 dB
    sc = fec.SCDecoder(128, 64, frozen_bits=ada.frozen_bits)
    sc_info = np.asarray(sc.decode(llr))
    ca_info = np.asarray(ca.decode(llr))
    from polarcode_and_ldpc_tpu.parity.polar_np import crc_check_np

    for i in range(200):
        if crc_check_np(sc_info[i]):
            np.testing.assert_array_equal(out[i], sc_info[i], err_msg=f"{i}")
        else:
            np.testing.assert_array_equal(out[i], ca_info[i], err_msg=f"{i}")


def test_adaptive_error_rate_matches_cascl(rng):
    enc, ada, ca = _setup()
    chan = fec.AWGNChannel(snr_db=2.0, seed=9)
    msgs = rng.integers(0, 2, (300, enc.K_data))
    llr = chan.transmit(enc.encode(msgs))
    out = ada.decode(llr)
    fer_ada = np.any(out[:, : enc.K_data] != msgs, axis=1).mean()
    fer_ca = np.any(np.asarray(ca.decode(llr))[:, : enc.K_data] != msgs,
                    axis=1).mean()
    # adaptive may only differ on frames where SC already found a CRC-valid
    # codeword, so FERs must be statistically indistinguishable
    assert abs(fer_ada - fer_ca) <= 0.02


def test_adaptive_all_pass_no_fallback(rng):
    enc, ada, _ = _setup()
    chan = fec.AWGNChannel(snr_db=8.0, seed=2)
    msgs = rng.integers(0, 2, (64, enc.K_data))
    out, stats = ada.decode(chan.transmit(enc.encode(msgs)), return_stats=True)
    assert stats["scl_fallbacks"] == 0
    np.testing.assert_array_equal(out[:, : enc.K_data], msgs)


def test_adaptive_budget_overflow_host_residue(rng):
    # more CRC failures than the in-graph fallback slice: the residue must
    # re-decode through the host-looped path with identical semantics
    frozen, _ = fec.construct_polar_code(128, 64, "bhattacharyya", 2.0)
    enc = fec.PolarEncoder(128, 64, frozen_bits=frozen, use_crc=True)
    tiny = fec.AdaptiveCASCLDecoder(128, 64, list_size=4,
                                    frozen_bits=frozen,
                                    fallback_batch=8, fallback_budget=4)
    ref = fec.AdaptiveCASCLDecoder(128, 64, list_size=4, frozen_bits=frozen)
    chan = fec.AWGNChannel(snr_db=-2.0, seed=3)
    msgs = rng.integers(0, 2, (120, enc.K_data))
    llr = chan.transmit(enc.encode(msgs))
    out_t, st_t = tiny.decode(llr, return_stats=True)
    out_r, st_r = ref.decode(llr, return_stats=True)
    assert st_t["scl_fallbacks"] == st_r["scl_fallbacks"] > 4
    assert st_t["budget_overflow"] > 0 and st_r["budget_overflow"] == 0
    np.testing.assert_array_equal(out_t, out_r)
