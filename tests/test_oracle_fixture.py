"""Oracle-schema import path: a committed fixture with the exact artifact
shapes the third-party wrappers emit (polarcodes frozen set; pyldpc (H, G)
with (n, k)-oriented G and k_actual) must flow through the framework's
constructors and decode correctly — the reference's production
construction path (``benchmarks/ber_simulation.py:145-152, 224-239``),
proven here without the libraries installed."""

import numpy as np

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.oracle.fixtures import (
    DEFAULT_FIXTURE,
    load_oracle_fixture,
)


def test_fixture_exists_and_loads():
    fx = load_oracle_fixture()
    assert DEFAULT_FIXTURE.exists()
    p, l = fx["polar"], fx["ldpc"]
    assert p["frozen_positions"].shape == (p["N"] - p["K"],)
    assert np.array_equal(p["frozen_positions"],
                          np.sort(p["frozen_positions"]))
    m = l["H"].shape[0]
    assert l["H"].shape == (m, l["n"])
    assert l["G_nk"].shape == (l["n"], l["k_actual"])  # pyldpc orientation
    # generator really is a null-space basis of H
    assert ((l["H"] @ l["G_nk"]) % 2 == 0).all()


def test_polar_decodes_with_oracle_frozen_set():
    fx = load_oracle_fixture()["polar"]
    N, K = fx["N"], fx["K"]
    enc = fec.PolarEncoder(N, K, frozen_bits=fx["frozen_positions"])
    dec = fec.SCLDecoder(N, K, list_size=4, frozen_bits=fx["frozen_positions"])
    msgs = np.random.default_rng(0).integers(0, 2, (16, K))
    llr = fec.AWGNChannel(3.0, seed=1).transmit(enc.encode(msgs))
    out = np.asarray(dec.decode(llr))
    assert (out != msgs).any(axis=1).mean() <= 0.2  # decodes meaningfully


def test_ldpc_decodes_with_oracle_H_G():
    fx = load_oracle_fixture()["ldpc"]
    n, k = fx["n"], fx["k_actual"]
    # (n, k)-oriented G exercises the pyldpc transposition branch
    # (reference src/ldpc/encoder.py:54-63)
    enc = fec.LDPCEncoder(n, k, H=fx["H"], G=fx["G_nk"])
    assert enc.G.shape == (k, n)
    msgs = np.random.default_rng(1).integers(0, 2, (32, k))
    cw = np.asarray(enc.encode(msgs))
    assert enc.verify_codeword(cw).all()
    np.testing.assert_array_equal(cw[:, :k], msgs)  # systematic convention
    dec = fec.BPDecoder(fx["H"], max_iter=20)
    llr = fec.AWGNChannel(3.0, seed=2).transmit(cw)
    bits = np.asarray(dec.decode(llr))
    assert (bits[:, :k] != msgs).mean() < 0.01


def test_fixture_through_montecarlo_pipeline():
    from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_ldpc_pipeline

    fx = load_oracle_fixture()["ldpc"]
    step = make_ldpc_pipeline(fx["H"], fx["G_nk"].T, 3.0, decoder="bp",
                              max_iter=20)
    res = MonteCarloSimulator(step, fx["k_actual"], chunk_frames=64).run(
        128, seed=3)
    assert res.frames == 128
    assert res.ber < 0.01
