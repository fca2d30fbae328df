"""Channel models (reference ``src/channel/``): exact LLR math on injected
noise, statistical properties of the sampled noise, seeding discipline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.channels.awgn import (
    awgn_capacity,
    awgn_noise_std,
    awgn_transmit,
    bpsk_demodulate_hard,
    bpsk_modulate,
    symbols_to_llr,
)
from polarcode_and_ldpc_tpu.channels.bsc import bsc_llr
from polarcode_and_ldpc_tpu.parity.channel_np import awgn_hard_np, awgn_llr_np, noise_std


def test_noise_std_formula():
    # σ = sqrt(1/(2·SNR_lin)) — reference awgn.py:29-32 (Es/N0 convention)
    assert abs(awgn_noise_std(0.0) - np.sqrt(0.5)) < 1e-12
    assert abs(awgn_noise_std(3.0) - noise_std(3.0)) < 1e-12


def test_bpsk_mapping():
    bits = jnp.array([0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(bpsk_modulate(bits)), [1, -1, 1, -1])
    sym = jnp.array([0.3, -0.2, 0.0, 5.0])
    # y ≤ 0 → 1 (reference awgn.py:49-59)
    np.testing.assert_array_equal(np.asarray(bpsk_demodulate_hard(sym)), [0, 1, 1, 0])


def test_awgn_llr_exact_on_injected_noise(rng):
    bits = rng.integers(0, 2, (6, 64))
    noise = rng.standard_normal((6, 64))
    for snr in (-2.0, 0.0, 3.0):
        got = np.asarray(awgn_transmit(None, bits, snr, noise=jnp.asarray(noise),
                                       dtype=jnp.float64))
        np.testing.assert_allclose(got, awgn_llr_np(bits, snr, noise), rtol=1e-12)
        hard = np.asarray(awgn_transmit(None, bits, snr, return_llr=False,
                                        noise=jnp.asarray(noise), dtype=jnp.float64))
        np.testing.assert_array_equal(hard, awgn_hard_np(bits, snr, noise))


def test_awgn_channel_noise_statistics():
    chan = fec.AWGNChannel(snr_db=2.0, seed=0, dtype=jnp.float64)
    bits = np.zeros((200, 256), np.int8)
    llr = np.asarray(chan.transmit(bits))
    std = awgn_noise_std(2.0)
    y = llr * std * std / 2.0  # invert LLR back to received symbols
    emp = (y - 1.0).std()
    assert abs(emp - std) / std < 0.02


def test_awgn_channel_seed_reproducible():
    a = fec.AWGNChannel(snr_db=1.0, seed=123)
    b = fec.AWGNChannel(snr_db=1.0, seed=123)
    bits = np.ones((4, 32), np.int8)
    np.testing.assert_array_equal(np.asarray(a.transmit(bits)), np.asarray(b.transmit(bits)))


def test_awgn_update_snr():
    chan = fec.AWGNChannel(snr_db=0.0, seed=0)
    chan.update_snr(5.0)
    assert abs(chan.noise_std - awgn_noise_std(5.0)) < 1e-9
    assert chan.get_capacity() == pytest.approx(awgn_capacity(5.0))


def test_bsc_flip_rate():
    chan = fec.BSCChannel(crossover_prob=0.1, seed=0)
    bits = np.zeros((100, 500), np.int8)
    out = np.asarray(chan.transmit(bits))
    assert abs(out.mean() - 0.1) < 0.005


def test_bsc_llr_values():
    llr = np.asarray(bsc_llr(jnp.array([0, 1]), 0.1, dtype=jnp.float64))
    mag = np.log(0.9 / 0.1)
    np.testing.assert_allclose(llr, [mag, -mag], rtol=1e-9)


def test_bsc_llr_degenerate_saturates():
    # p ∈ {0, 1} (and extreme p) must emit finite, ±20-saturated LLRs: the
    # one-hot matmul gather in the LDPC graph is exact only for finite
    # messages (0 × inf = NaN would poison the first BP iteration)
    for p, sign in [(0.0, +1.0), (1.0, -1.0), (1e-12, +1.0)]:
        llr = np.asarray(bsc_llr(jnp.array([0, 1]), p, dtype=jnp.float64))
        assert np.all(np.isfinite(llr))
        np.testing.assert_allclose(llr, [sign * 20.0, -sign * 20.0])


def test_rayleigh_channel(rng):
    chan = fec.RayleighFadingChannel(snr_db=10.0, seed=0)
    bits = rng.integers(0, 2, (200, 128))
    llr = np.asarray(chan.transmit(bits))
    assert llr.shape == bits.shape
    # CSI-aware LLR signs should still mostly match the bits at 10 dB
    hard = (llr < 0).astype(int)
    assert (hard != bits).mean() < 0.05
    # fading must be strictly worse than AWGN at the same SNR
    awgn = fec.AWGNChannel(snr_db=10.0, seed=0)
    hard_awgn = (np.asarray(awgn.transmit(bits)) < 0).astype(int)
    assert (hard != bits).mean() > (hard_awgn != bits).mean()


def test_rician_channel(rng):
    chan = fec.RicianFadingChannel(snr_db=10.0, k_factor=5.0, seed=0)
    bits = rng.integers(0, 2, (100, 64))
    llr = np.asarray(chan.transmit(bits))
    hard = (llr < 0).astype(int)
    # strong LoS (K=5) → better than Rayleigh
    ray = fec.RayleighFadingChannel(snr_db=10.0, seed=0)
    hard_ray = (np.asarray(ray.transmit(bits)) < 0).astype(int)
    assert (hard != bits).mean() <= (hard_ray != bits).mean()


def test_capacity_monotone():
    caps = [awgn_capacity(s) for s in (-5, 0, 5, 10)]
    assert all(b > a for a, b in zip(caps, caps[1:]))


def test_fading_llr_exact_on_injected_state(rng):
    from polarcode_and_ldpc_tpu.channels.fading import fading_apply
    from polarcode_and_ldpc_tpu.parity.channel_np import fading_llr_np

    bits = rng.integers(0, 2, (5, 32))
    h = np.abs(rng.standard_normal((5, 32))) + 0.1
    noise = rng.standard_normal((5, 32))
    for snr in (0.0, 6.0):
        got = np.asarray(fading_apply(bits, snr, jnp.asarray(h), noise,
                                      dtype=jnp.float64))
        np.testing.assert_allclose(got, fading_llr_np(bits, snr, h, noise),
                                   rtol=1e-12)


def test_bsc_parity_twin(rng):
    from polarcode_and_ldpc_tpu.parity.channel_np import bsc_np

    bits = rng.integers(0, 2, (4, 16))
    flips = rng.integers(0, 2, (4, 16))
    np.testing.assert_array_equal(bsc_np(bits, flips), bits ^ flips)
