"""Row-layered min-sum (serving schedule; gap-fill feature — the reference
only floods, ``src/ldpc/decoder.py:150-198``).  Semantics are DEFINED by the
float64 NumPy twin ``parity/ldpc_np.layered_ms_decode_np``; the XLA decoder,
the Pallas kernel (interpret mode here) and the QC roll path must match it
bit-for-bit including per-frame iteration counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.models.ldpc.graph import TannerGraph
from polarcode_and_ldpc_tpu.models.ldpc.layered import (
    LayeredMSDecoder,
    layer_bounds,
    make_layered_ms_decoder,
)
from polarcode_and_ldpc_tpu.ops.bp_pallas import make_bp_decoder_pallas
from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np
from polarcode_and_ldpc_tpu.parity.ldpc_np import layered_ms_decode_np


@pytest.mark.parametrize("num_layers,norm,offset", [(4, 0.75, 0.0),
                                                    (3, 1.0, 0.0),
                                                    (2, 1.0, 0.5)])
def test_layered_matches_numpy_twin(num_layers, norm, offset, rng):
    # irregular MacKay H (padded slots) — bits AND iteration counts exact
    enc = fec.LDPCEncoder(96, 48, dv=3, dc=6, seed=42)
    dec = LayeredMSDecoder(enc.H, max_iter=15, normalization=norm,
                           offset=offset, dtype=jnp.float64,
                           num_layers=num_layers)
    llr = rng.standard_normal((8, 96)) * 2 + 1.0
    llr[0, :4] = 0.0  # sign(0)=0 zero-propagation path
    bits, iters = dec.decode(llr, return_iterations=True)
    for i in range(len(llr)):
        rb, ri = layered_ms_decode_np(enc.H, llr[i], 15, norm, offset,
                                      True, num_layers)
        np.testing.assert_array_equal(np.asarray(bits)[i], rb, err_msg=f"{i}")
        assert int(np.asarray(iters)[i]) == ri


def test_layered_pallas_kernel_bit_identical(rng):
    # fused kernel (interpret mode) vs the XLA decoder: bits + iters exact
    enc = fec.LDPCEncoder(96, 48, dv=3, dc=6, seed=42)
    g = TannerGraph.from_H(enc.H)
    llr = jnp.asarray((rng.standard_normal((128, 96)) * 2 + 1.5)
                      .astype(np.float32))
    for nl in (1, 4):
        xla = jax.jit(make_layered_ms_decoder(g, 12, 0.75, 0.0, True,
                                              jnp.float32, nl))
        ker = make_bp_decoder_pallas(g, 12, True, 128, interpret=True,
                                     check_rule="ms", normalization=0.75,
                                     schedule="layered", num_layers=nl)
        bx, ix = xla(llr)
        bk, ik = ker(llr)
        np.testing.assert_array_equal(np.asarray(bx), np.asarray(bk))
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ik))


def test_layered_converges_faster_with_matched_error_rate(rng):
    # the point of the schedule: fewer iterations than flooding at the same
    # operating point, statistically identical error rate
    enc = fec.LDPCEncoder(504, 252, dv=3, dc=6, seed=42)
    msgs = rng.integers(0, 2, (256, enc.k)).astype(np.int8)
    cw = (msgs.astype(np.int64) @ np.asarray(enc.G)) % 2
    llr = jnp.asarray(awgn_llr_np(cw, 1.0, rng.standard_normal(cw.shape))
                      .astype(np.float32))
    flood = fec.NMSDecoder(enc.H, max_iter=30)
    layered = fec.LayeredMSDecoder(enc.H, max_iter=30, normalization=0.75,
                                   num_layers=4)
    bf, itf = flood.decode(llr, return_iterations=True)
    bl, itl = layered.decode(llr, return_iterations=True)
    ber_f = float((np.asarray(bf)[:, enc.info_positions] != msgs).mean())
    ber_l = float((np.asarray(bl)[:, enc.info_positions] != msgs).mean())
    assert float(np.asarray(itl).mean()) < 0.9 * float(np.asarray(itf).mean())
    assert abs(ber_f - ber_l) < 5e-3


def test_layer_bounds_cover_and_partition():
    for m, nl in [(252, 4), (252, 6), (97, 4), (5, 8)]:
        b = layer_bounds(m, nl)
        assert b[0][0] == 0 and b[-1][1] == m
        for (a0, a1), (b0, _) in zip(b, b[1:]):
            assert a1 == b0 and a1 > a0


def test_flooding_default_untouched(rng):
    # the reference-exact flooding decoders must not change behavior
    enc = fec.LDPCEncoder(96, 48, dv=3, dc=6, seed=1)
    d = fec.NMSDecoder(enc.H, max_iter=10, dtype=jnp.float64)
    from polarcode_and_ldpc_tpu.parity.ldpc_np import ms_decode_np

    llr = rng.standard_normal((4, 96)) * 2 + 1.0
    bits, iters = d.decode(llr, return_iterations=True)
    for i in range(4):
        rb, ri = ms_decode_np(enc.H, llr[i], 10, 0.75)
        np.testing.assert_array_equal(np.asarray(bits)[i], rb)
        assert int(np.asarray(iters)[i]) == ri


def test_qc_layered_matches_twin_and_generic(rng):
    # QC roll-path layered (layers = base rows) vs the float64 twin on the
    # expanded H, and vs the generic layered decoder — bits + iters exact
    from polarcode_and_ldpc_tpu.models.ldpc.matrix import (
        qc_base_matrix,
        qc_expand,
    )
    from polarcode_and_ldpc_tpu.models.ldpc.qc import QCBPDecoder

    base = qc_base_matrix(96, 48, 8, dv=3, dc=6, seed=5)
    H = qc_expand(base, 8)
    mb = base.shape[0]
    llr = rng.standard_normal((6, 96)) * 2 + 1.0
    qc = QCBPDecoder(base, 8, max_iter=12, variant="nms", normalization=0.75,
                     dtype=jnp.float64, schedule="layered")
    bits, iters = qc.decode(llr, return_iterations=True)
    for i in range(6):
        rb, ri = layered_ms_decode_np(H, llr[i], 12, 0.75, 0.0, True, mb)
        np.testing.assert_array_equal(np.asarray(bits)[i], rb, err_msg=str(i))
        assert int(np.asarray(iters)[i]) == ri
    gen = LayeredMSDecoder(H, max_iter=12, normalization=0.75,
                           dtype=jnp.float64, num_layers=mb)
    bg, ig = gen.decode(llr, return_iterations=True)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bg))
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(ig))
