"""Metrics layer (reference ``src/utils/metrics.py``) and complexity
constants (reference ``benchmarks/complexity_analysis.py``)."""

import numpy as np
import pytest

from polarcode_and_ldpc_tpu.utils import (
    analyze_complexity,
    calculate_ber,
    calculate_fer,
    calculate_throughput,
    ebn0_to_snr,
    ldpc_complexity,
    polar_complexity,
    snr_to_ebn0,
    wilson_confidence_interval,
)
from polarcode_and_ldpc_tpu.utils.metrics import ber_fer_counts


def test_ber():
    a = np.array([0, 1, 0, 1])
    b = np.array([0, 1, 1, 1])
    assert calculate_ber(a, b) == 0.25
    assert calculate_ber(a, a) == 0.0


def test_fer():
    orig = np.array([[0, 1], [1, 1], [0, 0]])
    dec = np.array([[0, 1], [1, 0], [1, 0]])
    assert calculate_fer(orig, dec) == pytest.approx(2 / 3)
    assert calculate_fer(orig[0], dec[0]) == 0.0


def test_throughput():
    assert calculate_throughput(1_000_000, 1.0) == 1.0
    assert calculate_throughput(100, 0.0) == 0.0


def test_wilson_interval():
    lo, hi = wilson_confidence_interval(10, 100)
    assert 0.0 <= lo < 0.1 < hi <= 1.0
    lo0, hi0 = wilson_confidence_interval(0, 100)
    assert lo0 == 0.0 and hi0 < 0.05
    assert wilson_confidence_interval(0, 0) == (0.0, 0.0)
    # narrower with more trials
    lo2, hi2 = wilson_confidence_interval(100, 1000)
    assert (hi2 - lo2) < (hi - lo)


def test_snr_ebn0_roundtrip():
    for rate in (0.5, 0.75):
        for snr in (-2.0, 0.0, 3.0):
            assert ebn0_to_snr(snr_to_ebn0(snr, rate), rate) == pytest.approx(snr)
    # rate 0.5: Eb/N0 = SNR + 3.01 dB
    assert snr_to_ebn0(0.0, 0.5) == pytest.approx(3.0103, abs=1e-3)


def test_ber_fer_counts_device():
    orig = np.array([[0, 1, 0], [1, 1, 1]], np.int8)
    dec = np.array([[0, 0, 1], [1, 1, 1]], np.int8)
    be, fe = ber_fer_counts(orig, dec)
    assert int(be) == 2 and int(fe) == 1


def test_complexity_reference_constants():
    # the reference's committed numbers (BASELINE.md "analytical complexity")
    p = polar_complexity(1024, 512, list_size=8)
    assert p["encoding"]["xor_operations"] == 10240
    assert p["sc_decoding"]["operations"] == 11264
    assert p["scl_decoding"]["operations"] == 81920
    l = ldpc_complexity(504, 252, dv=3, dc=6, max_iterations=20)
    assert l["bp_decoding"]["operations"] == 151200
    combined = analyze_complexity()
    assert combined["polar"]["scl_decoding"]["operations"] == 81920
    assert combined["ldpc"]["bp_decoding"]["operations"] == 151200
