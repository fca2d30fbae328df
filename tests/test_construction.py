"""Polar code construction (reference ``src/polar/construction.py``,
``src/polar/utils.py:11-83``)."""

import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.models.polar.construction import (
    bit_reverse,
    bit_reverse_array,
    bit_reverse_permutation,
    dega_llr_means,
)


def test_bit_reverse():
    assert bit_reverse(0b001, 3) == 0b100
    assert bit_reverse(0b110, 3) == 0b011
    assert bit_reverse(5, 4) == 10
    perm = bit_reverse_permutation(8)
    np.testing.assert_array_equal(perm, [0, 4, 2, 6, 1, 5, 3, 7])
    # involution
    np.testing.assert_array_equal(perm[perm], np.arange(8))


def test_bit_reverse_array(rng):
    arr = rng.standard_normal(16)
    out = bit_reverse_array(arr, 4)
    perm = bit_reverse_permutation(16)
    np.testing.assert_array_equal(out, arr[perm])


def test_bhattacharyya_properties():
    z = fec.bhattacharyya_bounds(256, 2.0)
    assert z.shape == (256,)
    assert np.all(z >= 0) and np.all(z <= 1)
    # better (lower Z) channels appear as SNR grows
    z_hi = fec.bhattacharyya_bounds(256, 5.0)
    assert z_hi.mean() < z.mean()


@pytest.mark.parametrize("method", ["bhattacharyya", "gaussian_approximation", "dega", "default"])
def test_construct_partition(method):
    N, K = 128, 64
    frozen, info = fec.construct_polar_code(N, K, method, 2.0)
    assert len(frozen) == N - K and len(info) == K
    assert not set(frozen.tolist()) & set(info.tolist())
    assert sorted(frozen.tolist() + info.tolist()) == list(range(N))


def test_construction_prefers_late_indices():
    # channel N-1 is the most reliable synthetic channel — always info
    frozen, info = fec.construct_polar_code(64, 32, "bhattacharyya", 2.0)
    assert 63 in info
    assert 0 in frozen  # channel 0 is the least reliable


def test_dega_means_monotone_in_snr():
    lo = dega_llr_means(64, 0.0)
    hi = dega_llr_means(64, 4.0)
    assert hi.sum() > lo.sum()


def test_generate_frozen_bits_heuristic():
    frozen, info = fec.generate_frozen_bits(32, 16)
    assert len(frozen) == 16 and len(info) == 16


def test_capacities():
    c = fec.calculate_channel_capacities(64, 2.0)
    assert c.shape == (64,)
    assert np.all(c >= -1e-9) and np.all(c <= 1 + 1e-9)


def test_construction_quality_large_N():
    # regression: the split recursion must index first-split-at-LSB for the
    # natural-order trellis; the interleaved (reference) order scrambles the
    # frozen set at large N (SC N=512 @2 dB decoded at BER≈0.3 before the fix)
    import jax.numpy as jnp
    import polarcode_and_ldpc_tpu as fec

    N, K = 512, 256
    frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    enc = fec.PolarEncoder(N, K, frozen_bits=frozen)
    dec = fec.SCDecoder(N, K, frozen_bits=frozen)
    chan = fec.AWGNChannel(snr_db=2.0, seed=0)
    msgs = np.random.default_rng(0).integers(0, 2, (100, K))
    out = np.asarray(dec.decode(chan.transmit(enc.encode(msgs))))
    assert np.any(out != msgs, axis=1).mean() <= 0.02


def test_monte_carlo_construction():
    frozen, info = fec.construct_polar_code(64, 32, "monte_carlo", 2.0)
    assert len(frozen) == 32 and len(info) == 32
    assert 63 in info and 0 in frozen


def test_genie_leaf_llrs_match_trellis(rng):
    from polarcode_and_ldpc_tpu.models.polar.construction import genie_leaf_llrs
    from polarcode_and_ldpc_tpu.utils.tracing import trace_sc_trellis

    N = 16
    llr = rng.standard_normal(N) * 2
    got = np.asarray(genie_leaf_llrs(llr.astype(np.float64)))
    # with an all-frozen mask every SC decision bit is 0, so the trellis
    # decision LLRs ARE the genie LLRs
    tr = trace_sc_trellis(llr, np.ones(N, bool))
    ref = np.array([s["decision_llr"]
                    for s in sorted(tr["steps"], key=lambda s: s["leaf"])])
    np.testing.assert_allclose(got, ref, atol=1e-9)
