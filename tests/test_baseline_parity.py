"""Statistical parity with the reference's committed BER baselines
(BASELINE.md; the north-star acceptance criterion "BER/FER curves must
match within the repo's statistical bounds")."""

import numpy as np

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_ldpc_pipeline, make_polar_pipeline

# benchmarks/results/data/ber_simulation_results.json (reference, CPU)
REF_POLAR_SC = {-1.5: 0.0586, -1.0: 0.0159}
REF_LDPC_BP = {-1.5: 0.0278, -1.0: 0.0059}


def test_polar_sc_matches_reference_curve():
    # DE-GA construction; the reference used polarcodes' frozen set, so
    # only statistical (not bit) parity is meaningful here
    frozen, _ = fec.construct_polar_code(1024, 512, "dega", 2.0)
    for snr, ref in REF_POLAR_SC.items():
        step = make_polar_pipeline(1024, 512, frozen, snr, decoder="sc")
        r = MonteCarloSimulator(step, 512, chunk_frames=1000).run(4000, seed=11)
        assert r.ber <= ref * 1.6, (snr, r.ber, ref)  # match or beat (w/ CI slack)


def test_ldpc_bp_matches_reference_curve():
    enc = fec.LDPCEncoder(504, 252, dv=3, dc=6, seed=42)  # regular H default
    for snr, ref in REF_LDPC_BP.items():
        step = make_ldpc_pipeline(enc.H, enc.G, snr, decoder="bp", max_iter=20,
                                  message_idx=enc.info_positions)
        r = MonteCarloSimulator(step, enc.k, chunk_frames=2000).run(8000, seed=7)
        assert r.ber <= ref * 1.6, (snr, r.ber, ref)
