"""CRC codec vs the scalar reference semantics (``src/polar/utils.py:86-163``)."""

import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.models.polar.crc import CRCCodec, crc_length
from polarcode_and_ldpc_tpu.parity.polar_np import crc_check_np, crc_encode_np

POLYS = ["CRC-8", "CRC-16", "CRC-24"]


@pytest.mark.parametrize("poly", POLYS)
def test_crc_roundtrip_matches_numpy(poly, rng):
    for _ in range(10):
        data = rng.integers(0, 2, 40)
        enc = np.asarray(fec.crc_encode(data, poly))
        np.testing.assert_array_equal(enc, crc_encode_np(data, poly))
        assert bool(fec.crc_check(enc, poly))
        assert crc_check_np(enc, poly)


@pytest.mark.parametrize("poly", POLYS)
def test_crc_detects_single_bit_errors(poly, rng):
    data = rng.integers(0, 2, 40)
    enc = np.asarray(fec.crc_encode(data, poly))
    for pos in range(len(enc)):
        bad = enc.copy()
        bad[pos] ^= 1
        assert not bool(fec.crc_check(bad, poly)), f"missed flip at {pos}"


def test_crc_codec_batched(rng):
    codec = CRCCodec(24, "CRC-8")
    data = rng.integers(0, 2, (50, 24))
    enc = np.asarray(codec.encode(data))
    assert enc.shape == (50, 32)
    ok = np.asarray(codec.check(enc))
    assert ok.all()
    bad = enc.copy()
    bad[:, 3] ^= 1
    assert not np.asarray(codec.check(bad)).any()


def test_crc_lengths():
    assert crc_length("CRC-8") == 8
    assert crc_length("CRC-16") == 16
    assert crc_length("CRC-24") == 24
