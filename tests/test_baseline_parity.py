"""Full-curve statistical parity with the reference's committed BER/FER
baselines (``benchmarks/results/data/ber_simulation_results.json``, all 17
SNR points, both metrics — VERDICT r1 next-step #6).

Constructions are not identical (the reference's production path uses
polarcodes/pyldpc artifacts; ours are DE-GA / regular-H), so acceptance is:

* every nonzero reference point: match-or-beat the reference's Wilson-CI
  upper bound (with slack for our own sampling noise);
* the channel-dominated low-SNR points additionally get a two-sided floor
  (a wrong σ/LLR convention would show up here regardless of
  construction);
* zero-reference points (the error floor): our measured rate must stay
  below the resolution our frame budget affords — this pins the waterfall:
  a decoder that beat the reference at −1.5 dB but diverged at +0.5 dB
  (the failure mode called out in VERDICT r1 weak #3) now fails.

One runtime-SNR compile serves each family's entire curve.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.sim import (
    MonteCarloSimulator,
    make_ldpc_pipeline,
    make_polar_pipeline,
)
from polarcode_and_ldpc_tpu.utils.metrics import wilson_confidence_interval

# benchmarks/results/data/ber_simulation_results.json (reference, CPU);
# 17 points, −2..6 dB step 0.5; reference budget: 1000 frames / 100 errors
SNR_DB = [-2.0 + 0.5 * i for i in range(17)]
REF = {
    "polar": {
        "ber": [0.185932, 0.058600, 0.015895, 0.002895, 2.0117e-4] + [0.0] * 12,
        "fer": [0.704225, 0.322581, 0.109051, 0.026, 0.003] + [0.0] * 12,
        "bits_per_frame": 512,
    },
    "ldpc": {
        "ber": [0.062872, 0.027798, 0.005910, 7.1654e-4, 1.7717e-4] + [0.0] * 12,
        "fer": [0.763359, 0.404858, 0.108460, 0.022, 0.004] + [0.0] * 12,
        "bits_per_frame": 252,
    },
}
TWO_SIDED_POINTS = {-2.0, -1.5}  # channel-dominated: construction-agnostic


def _ref_frames(fer: float) -> int:
    # reference early-stops at 100 frame errors within a 1000-frame budget
    return int(round(100 / fer)) if fer > 0.1 else 1000


def _budget(ref_fer: float) -> int:
    if ref_fer >= 0.1:
        return 1000
    if ref_fer > 0.0:
        return 3000
    return 1500


def _run_curve(step, bits_per_frame, ref):
    sim = MonteCarloSimulator(step, bits_per_frame, chunk_frames=1500)
    out = []
    for snr, ref_fer in zip(SNR_DB, ref["fer"]):
        res = sim.run(_budget(ref_fer), seed=11,
                      extra_args=(jnp.float32(snr),))
        out.append(res)
    assert sim._step._cache_size() == 1  # one compile for the whole curve
    return out


def _check_curve(results, ref):
    for i, (snr, res) in enumerate(zip(SNR_DB, results)):
        frames_ref = _ref_frames(ref["fer"][i])
        for metric, trials_ours, trials_ref in (
            ("ber", res.frames * res.bits_per_frame,
             frames_ref * ref["bits_per_frame"]),
            ("fer", res.frames, frames_ref),
        ):
            ours = getattr(res, metric)
            refv = ref[metric][i]
            if refv > 0:
                errs_ref = int(round(refv * trials_ref))
                lo, hi = wilson_confidence_interval(errs_ref, trials_ref, 0.95)
                # 1.6× slack: constructions are different random/heuristic
                # instances (measured ~1.1–1.5× point-wise spread between
                # equally-valid codes); the floor checks below are the sharp
                # divergence guard
                assert ours <= hi * 1.6, (snr, metric, ours, refv, hi)
                if snr in TWO_SIDED_POINTS:
                    assert ours >= lo * 0.5, (snr, metric, ours, refv, lo)
            else:
                # resolution-limited bound at the reference's error floor
                cap = {"ber": 5e-4, "fer": 5e-3}[metric]
                assert ours <= cap, (snr, metric, ours)


def test_polar_sc_full_curve_parity():
    # design SNR 0 dB: measured closest statistical match to the reference's
    # polarcodes-constructed curve across −1.5..0 dB (its "design 2.0 dB"
    # uses a different Bhattacharyya parameterization than ours)
    frozen, _ = fec.construct_polar_code(1024, 512, "bhattacharyya", 0.0)
    step = make_polar_pipeline(1024, 512, frozen, None, decoder="sc")
    results = _run_curve(step, 512, REF["polar"])
    _check_curve(results, REF["polar"])


def test_ldpc_bp_full_curve_parity():
    enc = fec.LDPCEncoder(504, 252, dv=3, dc=6, seed=42)
    step = make_ldpc_pipeline(enc.H, enc.G, None, decoder="bp", max_iter=20,
                              message_idx=enc.info_positions)
    results = _run_curve(step, enc.k, REF["ldpc"])
    _check_curve(results, REF["ldpc"])
