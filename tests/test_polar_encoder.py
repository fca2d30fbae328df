"""Polar encoder vs the NumPy parity twin (reference ``src/polar/encoder.py``,
``src/polar/utils.py:219-228``)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.parity.polar_np import polar_encode_np, polar_transform_np


@pytest.mark.parametrize("N", [2, 8, 64, 256, 1024])
def test_transform_matches_numpy(N, rng):
    u = rng.integers(0, 2, N)
    got = np.asarray(fec.polar_transform(u))
    np.testing.assert_array_equal(got, polar_transform_np(u))


def test_transform_batched(rng):
    u = rng.integers(0, 2, (5, 7, 64))
    got = np.asarray(fec.polar_transform(u))
    for i in range(5):
        for j in range(7):
            np.testing.assert_array_equal(got[i, j], polar_transform_np(u[i, j]))


def test_transform_is_involution(rng):
    # x·G_N·G_N = x over GF(2) (G_N is its own inverse)
    u = rng.integers(0, 2, (10, 128))
    x = fec.polar_transform(fec.polar_transform(u))
    np.testing.assert_array_equal(np.asarray(x), u)


@pytest.mark.parametrize("N,K", [(16, 8), (64, 32), (256, 128)])
def test_encoder_matches_numpy(N, K, rng):
    frozen, info = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen)
    msgs = rng.integers(0, 2, (20, K))
    got = np.asarray(enc.encode(msgs))
    for i in range(20):
        np.testing.assert_array_equal(got[i], polar_encode_np(msgs[i], N, info))


def test_encoder_with_crc_matches_numpy(rng):
    N, K = 64, 32
    frozen, info = fec.construct_polar_code(N, K)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen, use_crc=True, crc_polynomial="CRC-8")
    assert enc.K_data == K - 8
    msgs = rng.integers(0, 2, (10, enc.K_data))
    got = np.asarray(enc.encode(msgs))
    for i in range(10):
        np.testing.assert_array_equal(
            got[i], polar_encode_np(msgs[i], N, info, use_crc=True))


def test_encoder_linearity(rng):
    # encoding is linear over GF(2): enc(a XOR b) = enc(a) XOR enc(b)
    N, K = 128, 64
    enc = fec.PolarEncoder(N, K)
    a = rng.integers(0, 2, K)
    b = rng.integers(0, 2, K)
    lhs = np.asarray(enc.encode(a ^ b))
    rhs = np.asarray(enc.encode(a)) ^ np.asarray(enc.encode(b))
    np.testing.assert_array_equal(lhs, rhs)


def test_encoder_api_surface():
    enc = fec.PolarEncoder(256, 128)
    assert enc.get_code_rate() == 0.5
    info = enc.get_info_bits_positions()
    frozen = enc.get_frozen_bits_positions()
    assert len(info) == 128 and len(frozen) == 128
    assert not set(info) & set(frozen)


def test_encoder_rejects_bad_params():
    with pytest.raises(AssertionError):
        fec.PolarEncoder(100, 50)  # not a power of 2
    with pytest.raises(AssertionError):
        fec.PolarEncoder(64, 64)  # K == N
