"""SC decoder: bit-exact parity with the NumPy twin on identical noise
(reference semantics: ``src/polar/decoder.py:12-173``; parity requirement from
BASELINE.json north star)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np
from polarcode_and_ldpc_tpu.parity.polar_np import polar_encode_np, sc_decode_np


@pytest.mark.parametrize("N,K,snr_db", [(8, 4, 1.0), (16, 8, 0.0), (64, 32, 1.0),
                                        (256, 128, 2.0)])
def test_sc_bit_exact_parity(N, K, snr_db, rng):
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    dec = fec.SCDecoder(N, K, frozen_bits=frozen, dtype=jnp.float64)
    frames = 16
    msgs = rng.integers(0, 2, (frames, K))
    noise = rng.standard_normal((frames, N))
    cw = np.stack([polar_encode_np(m, N, info) for m in msgs])
    llr = awgn_llr_np(cw, snr_db, noise)
    got_u = np.asarray(dec.decode_full(llr))
    for i in range(frames):
        ref_u = sc_decode_np(llr[i], dec.frozen_mask)
        np.testing.assert_array_equal(got_u[i], ref_u, err_msg=f"frame {i}")


def test_sc_noiseless_roundtrip(rng):
    N, K = 128, 64
    frozen, info = fec.construct_polar_code(N, K)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen)
    dec = fec.SCDecoder(N, K, frozen_bits=frozen)
    msgs = rng.integers(0, 2, (32, K))
    cw = np.asarray(enc.encode(msgs))
    llr = (1.0 - 2.0 * cw) * 100.0  # ±100 LLRs, reference-style noiseless probe
    out = np.asarray(dec.decode(llr))
    np.testing.assert_array_equal(out, msgs)


def test_sc_high_snr_perfect(rng):
    # mirrors tests/test_scl_decoder.py:148-156 (10 dB → perfect decode)
    N, K = 64, 32
    frozen, _ = fec.construct_polar_code(N, K)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen)
    dec = fec.SCDecoder(N, K, frozen_bits=frozen)
    chan = fec.AWGNChannel(snr_db=10.0, seed=7)
    msgs = rng.integers(0, 2, (64, K))
    out = np.asarray(dec.decode(chan.transmit(enc.encode(msgs))))
    np.testing.assert_array_equal(out, msgs)


def test_sc_single_frame_shape():
    N, K = 32, 16
    dec = fec.SCDecoder(N, K)
    llr = np.linspace(-3, 3, N)
    out = dec.decode(llr)
    assert out.shape == (K,)


def test_sc_all_zero_codeword():
    N, K = 64, 32
    dec = fec.SCDecoder(N, K)
    llr = np.full((4, N), 50.0)  # strongly bit-0 everywhere
    out = np.asarray(dec.decode(llr))
    assert (out == 0).all()


def test_f_minsum_bitlevel_form_exact(rng):
    # f_minsum's bit-level form (sign bit = XOR of operand sign bits,
    # or'd onto min(|a|,|b|)) must be bitwise identical to the reference
    # two-sign-multiplies form for every finite input, including +-0 and
    # subnormals (no product is formed, so nothing underflows)
    from polarcode_and_ldpc_tpu.models.polar.trellis import f_minsum

    def f_ref(a, b):
        return jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a),
                                                       jnp.abs(b))

    for dt, it in ((np.float32, np.int32), (np.float64, np.int64)):
        vals = np.concatenate([
            rng.standard_normal(300),
            [0.0, -0.0, 1e-40, -1e-40, 37.5, -37.5, 2.5, -2.5],
        ]).astype(dt)
        a = np.repeat(vals, len(vals)).astype(dt)
        b = np.tile(vals, len(vals)).astype(dt)
        old = np.asarray(f_ref(jnp.asarray(a), jnp.asarray(b)))
        new = np.asarray(f_minsum(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(old.view(it), new.view(it))
