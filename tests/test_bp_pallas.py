"""Fused Pallas BP kernel: interpret-mode bit-equivalence with the XLA
decoder, and the regular (Gallager) construction that enables it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.ops.bp_pallas import (
    make_bp_decoder_pallas,
    pallas_supported,
)


def test_regular_construction_degrees():
    H = fec.regular_construction(504, 252, 3, 6, seed=42)
    np.testing.assert_array_equal(H.sum(axis=0), 3)
    np.testing.assert_array_equal(H.sum(axis=1), 6)
    # mackay rows are NOT regular (reference matrix.py:46-49) — the new
    # constructor is the fix
    Hm = fec.mackay_construction(504, 252, 3, 6, seed=42)
    assert Hm.sum(axis=1).max() > 6


def test_regular_construction_encodes(rng):
    H = fec.regular_construction(120, 60, 3, 6, seed=7)
    enc = fec.LDPCEncoder(120, 60, H=H)
    msgs = rng.integers(0, 2, (10, enc.k))
    cw = np.asarray(enc.encode(msgs))
    assert ((H @ cw.T) % 2 == 0).all()


@pytest.mark.parametrize("early_stop", [True, False])
def test_pallas_bp_matches_xla(early_stop, rng):
    H = fec.regular_construction(96, 48, 3, 6, seed=3)
    enc = fec.LDPCEncoder(96, 48, H=H)
    dec_x = fec.BPDecoder(H, max_iter=12, early_stop=early_stop)
    assert pallas_supported(dec_x.graph, 32)
    dec_p = make_bp_decoder_pallas(dec_x.graph, max_iter=12,
                                   early_stop=early_stop, batch_tile=32,
                                   interpret=True)
    chan = fec.AWGNChannel(2.0, seed=7)
    msgs = rng.integers(0, 2, (64, enc.k))
    llr = np.asarray(chan.transmit(enc.encode(msgs)), np.float32)
    b_p, i_p = dec_p(jnp.asarray(llr))
    b_x, i_x = dec_x.decode(llr, return_iterations=True)
    np.testing.assert_array_equal(np.asarray(b_p), np.asarray(b_x))
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_pallas_gating():
    H = fec.regular_construction(96, 48, 3, 6, seed=1)
    # auto on CPU falls back to xla; explicit pallas raises off-TPU
    d = fec.BPDecoder(H, impl="auto")
    assert d.impl == "xla"
    with pytest.raises(ValueError):
        fec.BPDecoder(H, impl="pallas")


@pytest.mark.parametrize("norm,offset", [(1.0, 0.0), (0.75, 0.0), (1.0, 0.5)])
def test_pallas_minsum_matches_xla(norm, offset, rng):
    """Min-sum check rule in the fused kernel (MS/NMS/OMS) is bit-identical
    to the XLA min-sum decoder in interpret mode."""
    from polarcode_and_ldpc_tpu.models.ldpc.minsum import MSDecoder

    H = fec.regular_construction(96, 48, 3, 6, seed=3)
    enc = fec.LDPCEncoder(96, 48, H=H)
    dec_x = MSDecoder(H, max_iter=12, normalization=norm, offset=offset)
    dec_p = make_bp_decoder_pallas(dec_x.graph, max_iter=12,
                                   early_stop=True, batch_tile=32,
                                   interpret=True, check_rule="ms",
                                   normalization=norm, offset=offset)
    chan = fec.AWGNChannel(2.0, seed=11)
    msgs = rng.integers(0, 2, (64, enc.k))
    llr = np.asarray(chan.transmit(enc.encode(msgs)), np.float32)
    b_p, i_p = dec_p(jnp.asarray(llr))
    b_x, i_x = dec_x.decode(llr, return_iterations=True)
    np.testing.assert_array_equal(np.asarray(b_p), np.asarray(b_x))
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_minsum_impl_gating():
    H = fec.regular_construction(96, 48, 3, 6, seed=1)
    from polarcode_and_ldpc_tpu.models.ldpc.minsum import MSDecoder

    d = MSDecoder(H, impl="auto")
    assert d.impl == "xla"  # CPU falls back
    with pytest.raises(ValueError):
        MSDecoder(H, impl="pallas")
