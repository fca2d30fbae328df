"""SSCL fast list nodes (``node_mode="fast"``) — parity + statistical tests.

The fast mode is *approximate* by design (rate-1 / repetition subtrees decode
whole instead of leaf-by-leaf; ``scanscl._rate1_fast`` / ``_rep_fast``), so
its oracle is its own float64 NumPy twin ``parity/polar_np.scl_decode_fast_np``
— bits must match exactly and metrics to 1e-9 (same standard as the exact
decoders' parity suite).  Against *exact* SCL the requirement is statistical:
frame-error counts at a waterfall SNR must agree within binomial noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polarcode_and_ldpc_tpu.models.polar.construction import (
    frozen_mask_from_positions,
    generate_frozen_bits,
)
from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan
from polarcode_and_ldpc_tpu.models.polar.scl import SCLDecoder
from polarcode_and_ldpc_tpu.parity.polar_np import scl_decode_fast_np


def _mask(N, K):
    fb, _ = generate_frozen_bits(N, K)
    return frozen_mask_from_positions(N, fb)


@pytest.mark.parametrize(
    "N,K,L,chunk,ctrl,leaf",
    [
        (64, 32, 4, 16, "split", "onehot"),
        (64, 40, 8, 16, "fused", "onehot"),
        (128, 70, 8, 32, "unroll-fused", "sort"),
        (256, 130, 8, 64, "split", "onehot"),
        (256, 200, 4, 256, "split", "onehot"),  # C == 1 single-body path
        (64, 30, 1, 16, "split", "onehot"),     # L = 1: no branching stages
    ],
)
def test_fast_nodes_match_numpy_twin(N, K, L, chunk, ctrl, leaf, rng):
    mask = _mask(N, K)
    dec = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=chunk, dtype=jnp.float64, control_impl=ctrl,
        leaf_impl=leaf, node_mode="fast"))
    llr = rng.normal(size=(6, N)) * 2.0
    llr[0, : N // 8] = 0.0  # zero-LLR ties exercise the stable orderings
    u, pm = map(np.asarray, dec(jnp.asarray(llr)))
    for b in range(llr.shape[0]):
        _, m, up = scl_decode_fast_np(llr[b], mask, L, chunk=chunk)
        np.testing.assert_array_equal(u[b], up, err_msg=f"frame {b} paths")
        np.testing.assert_allclose(pm[b], m, rtol=1e-9, atol=1e-9,
                                   err_msg=f"frame {b} metrics")


def test_fast_nodes_control_mode_invariant(rng):
    """All non-Pallas control modes run the identical fast-node program —
    outputs are bit-identical across them."""
    N, K, L, chunk = 128, 70, 8, 32
    mask = _mask(N, K)
    llr = jnp.asarray(rng.normal(size=(8, N)) * 2.0)
    outs = {}
    for ctrl in ("split", "fused", "unroll-fused"):
        dec = jax.jit(make_scl_decoder_scan(
            N, mask, L, chunk=chunk, dtype=jnp.float64, control_impl=ctrl,
            node_mode="fast"))
        outs[ctrl] = tuple(np.asarray(x) for x in dec(llr))
    for ctrl in ("fused", "unroll-fused"):
        np.testing.assert_array_equal(outs["split"][0], outs[ctrl][0])
        np.testing.assert_array_equal(outs["split"][1], outs[ctrl][1])


def test_fast_mode_error_rate_matches_exact_statistically(rng):
    """Fast-node CA-SCL must not degrade error correction measurably:
    frame-error counts at a waterfall SNR agree with exact CA-SCL within
    binomial noise (the Fast-SSCL guarantee carries over empirically)."""
    N, K, L = 256, 136, 8
    snr_db, frames = 1.5, 384
    exact = SCLDecoder(N, K, L, use_crc=True, crc_polynomial="CRC-8",
                       impl="scan-chunked", chunk=64)
    fast = SCLDecoder(N, K, L, use_crc=True, crc_polynomial="CRC-8",
                      impl="scan-chunked", chunk=64, node_mode="fast")
    kbits = K - 8
    msgs = rng.integers(0, 2, size=(frames, kbits))
    from polarcode_and_ldpc_tpu.parity.polar_np import polar_encode_np
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np

    info = exact.info_bits
    cw = np.stack([polar_encode_np(m, N, info, use_crc=True) for m in msgs])
    noise = rng.standard_normal(cw.shape)
    llr = awgn_llr_np(cw, snr_db, noise)
    fe = {}
    for name, d in (("exact", exact), ("fast", fast)):
        out = np.asarray(d.decode(jnp.asarray(llr)))[:, :kbits]
        fe[name] = int((out != msgs).any(axis=1).sum())
    # both must be in the waterfall (test is vacuous otherwise) and agree
    # within generous binomial slack
    assert 0 < fe["exact"] < frames // 2, fe
    assert fe["fast"] <= fe["exact"] * 1.5 + 8, fe
    assert fe["fast"] >= fe["exact"] * 0.5 - 8, fe


def test_fast_mode_through_pipeline_and_adaptive(rng):
    """scl_node_mode threads through the Monte-Carlo pipeline and the
    adaptive serving decoder; outputs stay CRC-consistent."""
    from polarcode_and_ldpc_tpu.models.polar.adaptive import (
        AdaptiveCASCLDecoder,
    )
    from polarcode_and_ldpc_tpu.sim.pipelines import make_polar_pipeline

    N, K = 128, 72
    fb, _ = generate_frozen_bits(N, K)
    step = make_polar_pipeline(N, K, fb, snr_db=2.0, decoder="ca-scl",
                               list_size=4, scl_chunk=32,
                               scl_node_mode="fast")
    key = jax.random.PRNGKey(0)
    stats = step(key, jnp.arange(64, dtype=jnp.uint32))
    ber = float(np.sum(np.asarray(stats["bit_errors"]))) / (64 * (K - 8))
    assert 0.0 <= ber < 0.5

    ada = AdaptiveCASCLDecoder(N, K, 4, fallback_batch=8,
                               scl_node_mode="fast")
    llr = jnp.asarray(rng.normal(size=(16, N)).astype(np.float32) * 0.5)
    out, s = ada.decode(llr, return_stats=True)
    assert out.shape == (16, K) and s["frames"] == 16


def test_fast_mode_path_constraints():
    # mega control has no fast nodes; the one-hot algebra's fast helpers
    # are XLA-only (lax.sort/scatter) — rank is required for kernel paths
    mask = _mask(64, 32)
    with pytest.raises(AssertionError):
        make_scl_decoder_scan(64, mask, 4, chunk=16, node_mode="fast",
                              control_impl="mega")
    with pytest.raises(AssertionError):
        make_scl_decoder_scan(64, mask, 4, chunk=16, node_mode="fast",
                              body_impl="pallas", perm_impl="onehot")
    with pytest.raises(AssertionError):
        make_scl_decoder_scan(64, mask, 4, chunk=16, node_mode="fast",
                              control_impl="kernel", perm_impl="onehot")


def test_fast_nodes_kernel_bit_identical(rng):
    """The in-kernel fast nodes (rank algebra: iterative min-extraction
    top-K, per-stage flip planes — ops/scl_body_pallas.py) must be
    bit-identical to the XLA fast path (interpret mode on CPU)."""
    N, K, L, chunk = 128, 70, 8, 32
    mask = _mask(N, K)
    llr = jnp.asarray((rng.normal(size=(128, N)) * 1.5).astype(np.float32))
    d_x = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=chunk, control_impl="unroll-fused",
        node_mode="fast", perm_impl="rank"))
    d_k = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=chunk, control_impl="kernel-interpret",
        node_mode="fast", perm_impl="rank"))
    u_x, m_x = d_x(llr)
    u_k, m_k = d_k(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_k))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_k))
    # and the onehot XLA fast path agrees (rank wrappers are conversions)
    d_o = jax.jit(make_scl_decoder_scan(
        N, mask, L, chunk=chunk, control_impl="split",
        node_mode="fast", perm_impl="onehot"))
    u_o, m_o = d_o(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_o))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_o))


def test_fast_mode_warns_above_l16():
    # measured envelope: fast nodes LOSE above L ~ 16 (6.96 vs 12.7 Mbps at
    # N=4096 SCL-32 on v5e, results/tpu/polar_n4096_scl32_fast.json) — the
    # factory must warn so a serving config can't ship the slow mode silently
    import warnings

    mask = _mask(256, 128)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_scl_decoder_scan(256, mask, 32, chunk=64, node_mode="fast")
    assert any("small-list serving mode" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_scl_decoder_scan(256, mask, 16, chunk=64, node_mode="fast")
        make_scl_decoder_scan(256, mask, 32, chunk=64, node_mode="exact")
    assert not any("small-list serving mode" in str(x.message) for x in w)
