"""Unrolled fast-path decoders (``fastsc.py``/``fastscl.py``) must be
bit-identical to the scan-trellis implementations and the NumPy twins —
including the exact rate-0/rate-1/REP/SPC node shortcuts and adversarial
zero-LLR ties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.models.polar.construction import frozen_mask_from_positions
from polarcode_and_ldpc_tpu.models.polar.fastsc import make_sc_decoder_unrolled
from polarcode_and_ldpc_tpu.models.polar.fastscl import make_scl_decoder_unrolled
from polarcode_and_ldpc_tpu.models.polar.sc import make_sc_decoder
from polarcode_and_ldpc_tpu.models.polar.scl import make_scl_decoder
from polarcode_and_ldpc_tpu.parity.polar_np import sc_decode_np, scl_decode_np


def _mask(N, K):
    frozen, _ = fec.construct_polar_code(N, K, "bhattacharyya", 2.0)
    return frozen_mask_from_positions(N, frozen)


@pytest.mark.parametrize("N", [8, 32, 128, 512])
def test_unrolled_sc_tie_exact(N, rng):
    # fast_nodes=False path (rate-0/REP only) is exact even on zero-LLR ties
    mask = _mask(N, N // 2)
    dec = jax.jit(make_sc_decoder_unrolled(N, mask, jnp.float64,
                                           fast_nodes=False))
    llr = rng.standard_normal((8, N)) * 2.0
    llr[0, : min(4, N)] = 0.0  # adversarial ties
    got = np.asarray(dec(llr))
    for i in range(len(llr)):
        np.testing.assert_array_equal(got[i], sc_decode_np(llr[i], mask))


@pytest.mark.parametrize("N", [8, 32, 128, 512])
def test_unrolled_sc_exact_continuous(N, rng):
    # rate-1/SPC shortcuts are exact for continuous (tie-free) LLRs
    mask = _mask(N, N // 2)
    dec = jax.jit(make_sc_decoder_unrolled(N, mask, jnp.float64,
                                           fast_nodes=True))
    llr = rng.standard_normal((16, N)) * 2.0
    got = np.asarray(dec(llr))
    for i in range(len(llr)):
        np.testing.assert_array_equal(got[i], sc_decode_np(llr[i], mask))


def test_unrolled_sc_equals_scan(rng):
    N = 256
    mask = _mask(N, 128)
    unrolled = jax.jit(make_sc_decoder(N, mask, jnp.float64, impl="unrolled"))
    scan = jax.jit(make_sc_decoder(N, mask, jnp.float64, impl="scan"))
    llr = rng.standard_normal((16, N)) * 2.0
    np.testing.assert_array_equal(np.asarray(unrolled(llr)),
                                  np.asarray(scan(llr)))


@pytest.mark.parametrize("N,L", [(16, 2), (64, 8), (128, 16)])
def test_unrolled_scl_exact(N, L, rng):
    mask = _mask(N, N // 2)
    dec = jax.jit(make_scl_decoder_unrolled(N, mask, L, jnp.float64))
    llr = rng.standard_normal((6, N)) * 1.5
    llr[0, :3] = 0.0
    u_paths, pm = dec(llr)
    u_paths, pm = np.asarray(u_paths), np.asarray(pm)
    for i in range(len(llr)):
        _, ref_m, ref_paths = scl_decode_np(llr[i], mask, L)
        np.testing.assert_allclose(pm[i], ref_m, atol=1e-9)
        np.testing.assert_array_equal(u_paths[i], ref_paths)


def test_unrolled_scl_equals_scan(rng):
    N, L = 128, 4
    mask = _mask(N, 64)
    unrolled = jax.jit(make_scl_decoder(N, mask, L, jnp.float64, impl="unrolled"))
    scan = jax.jit(make_scl_decoder(N, mask, L, jnp.float64, impl="scan"))
    llr = rng.standard_normal((8, N)) * 1.5
    u_u, pm_u = unrolled(llr)
    u_s, pm_s = scan(llr)
    np.testing.assert_allclose(np.asarray(pm_u), np.asarray(pm_s), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(u_u), np.asarray(u_s))


@pytest.mark.parametrize("N,L,S", [(16, 2, 4), (64, 8, 16), (128, 4, 64),
                                   (64, 4, 64)])
def test_scan_chunked_scl_exact(N, L, S, rng):
    # chunk-scan fast path vs the NumPy twin — exact bits, exact-order
    # metrics (sequential frozen-leaf accumulation matches the reference,
    # decoder.py:264-281), including adversarial zero-LLR ties
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan

    mask = _mask(N, N // 2)
    dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S, dtype=jnp.float64))
    llr = rng.standard_normal((6, N)) * 1.5
    llr[0, :3] = 0.0
    u_paths, pm = dec(llr)
    u_paths, pm = np.asarray(u_paths), np.asarray(pm)
    for i in range(len(llr)):
        _, ref_m, ref_paths = scl_decode_np(llr[i], mask, L)
        np.testing.assert_allclose(pm[i], ref_m, atol=1e-9)
        np.testing.assert_array_equal(u_paths[i], ref_paths)


def test_scan_chunked_scl_equals_unrolled(rng):
    N, L = 256, 8
    mask = _mask(N, 130)  # non-power-of-two K → irregular chunk patterns
    unrolled = jax.jit(make_scl_decoder(N, mask, L, jnp.float64,
                                        impl="unrolled"))
    chunked = jax.jit(make_scl_decoder(N, mask, L, jnp.float64,
                                       impl="scan-chunked", chunk=32))
    llr = rng.standard_normal((8, N)) * 1.5
    u_u, pm_u = unrolled(llr)
    u_c, pm_c = chunked(llr)
    np.testing.assert_allclose(np.asarray(pm_u), np.asarray(pm_c), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(u_u), np.asarray(u_c))


@pytest.mark.parametrize("chunk", [64, 128])  # 128 = the bench/default config
def test_scan_chunked_scl_flagship_size(chunk, rng):
    # N=1024 SCL: chunk-scan must equal the unrolled fast path bit-for-bit
    N, L = 1024, 8
    mask = _mask(N, 512)
    unrolled = jax.jit(make_scl_decoder(N, mask, L, jnp.float64,
                                        impl="unrolled"))
    chunked = jax.jit(make_scl_decoder(N, mask, L, jnp.float64,
                                       impl="scan-chunked", chunk=chunk))
    llr = rng.standard_normal((4, N)) * 1.5
    u_u, pm_u = unrolled(llr)
    u_c, pm_c = chunked(llr)
    np.testing.assert_allclose(np.asarray(pm_u), np.asarray(pm_c), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(u_u), np.asarray(u_c))


def test_decoder_classes_accept_impl(rng):
    sc_u = fec.SCDecoder(64, 32, impl="unrolled")
    sc_s = fec.SCDecoder(64, 32, impl="scan")
    llr = rng.standard_normal((4, 64)) * 3
    np.testing.assert_array_equal(np.asarray(sc_u.decode(llr)),
                                  np.asarray(sc_s.decode(llr)))
    scl_u = fec.SCLDecoder(64, 32, list_size=4, impl="unrolled")
    scl_s = fec.SCLDecoder(64, 32, list_size=4, impl="scan")
    np.testing.assert_array_equal(np.asarray(scl_u.decode(llr)),
                                  np.asarray(scl_s.decode(llr)))


def test_onehot_scl_equals_gather(rng):
    from polarcode_and_ldpc_tpu.models.polar.fastscl import make_scl_decoder_unrolled

    N, L = 64, 8
    mask = _mask(N, 32)
    oh = jax.jit(make_scl_decoder_unrolled(N, mask, L, jnp.float32, use_onehot=True))
    ga = jax.jit(make_scl_decoder_unrolled(N, mask, L, jnp.float32, use_onehot=False))
    llr = rng.standard_normal((8, N)).astype(np.float32) * 1.5
    u_o, pm_o = oh(llr)
    u_g, pm_g = ga(llr)
    np.testing.assert_array_equal(np.asarray(u_o), np.asarray(u_g))
    np.testing.assert_allclose(np.asarray(pm_o), np.asarray(pm_g), atol=1e-6)


def test_ldpc_matmul_permute_equals_gather(rng):
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.ldpc import graph as graph_mod

    enc = fec.LDPCEncoder(96, 48, dv=3, dc=6, seed=3)
    llr = (rng.standard_normal((8, 96)) * 3).astype(np.float32)
    dec_mm = fec.BPDecoder(enc.H, max_iter=15)
    assert dec_mm.graph.cv_permute is not None
    old = graph_mod.MATMUL_PERMUTE_MAX_SLOTS
    try:
        graph_mod.MATMUL_PERMUTE_MAX_SLOTS = 0
        dec_g = fec.BPDecoder(enc.H, max_iter=15)
    finally:
        graph_mod.MATMUL_PERMUTE_MAX_SLOTS = old
    assert dec_g.graph.cv_permute is None
    b_mm, i_mm = dec_mm.decode(llr, return_iterations=True)
    b_g, i_g = dec_g.decode(llr, return_iterations=True)
    np.testing.assert_array_equal(np.asarray(b_mm), np.asarray(b_g))
    np.testing.assert_array_equal(np.asarray(i_mm), np.asarray(i_g))


def test_unrolled_scl_exact_flagship_size(rng):
    # N=1024 spot-check vs the NumPy twin (full parity sweep runs at small N)
    N, L = 1024, 2
    mask = _mask(N, 512)
    dec = jax.jit(make_scl_decoder_unrolled(N, mask, L, jnp.float64))
    llr = rng.standard_normal((2, N)) * 1.5
    u, pm = dec(llr)
    u, pm = np.asarray(u), np.asarray(pm)
    for i in range(2):
        _, ref_m, ref_paths = scl_decode_np(llr[i], mask, L)
        np.testing.assert_allclose(pm[i], ref_m, atol=1e-9)
        np.testing.assert_array_equal(u[i], ref_paths)


@pytest.mark.parametrize("N,L,S", [(64, 8, 16), (128, 32, 64), (256, 4, 64)])
def test_scan_chunked_sort_leaf_exact(N, L, S, rng):
    # sort-based info-leaf selection (the large-L path, e.g. SCL-32) must
    # match the NumPy twin exactly — stable lax.sort reproduces the
    # reference's metric-desc / candidate-index tie order (decoder.py:306-307)
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan

    mask = _mask(N, N // 2)
    dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S,
                                        dtype=jnp.float64, leaf_impl="sort"))
    llr = rng.standard_normal((4, N)) * 1.5
    llr[0, :3] = 0.0  # adversarial zero-LLR ties
    u_paths, pm = dec(llr)
    u_paths, pm = np.asarray(u_paths), np.asarray(pm)
    for i in range(len(llr)):
        _, ref_m, ref_paths = scl_decode_np(llr[i], mask, L)
        np.testing.assert_allclose(pm[i], ref_m, atol=1e-9)
        np.testing.assert_array_equal(u_paths[i], ref_paths)


def test_scan_chunked_sort_leaf_equals_onehot_large_list(rng):
    # the two leaf selections are interchangeable at every config — pin the
    # SCL-32 shape used by the large-code artifact (tools/large_code_runs.py)
    N, L, S = 512, 32, 128
    mask = _mask(N, 300)  # irregular K → duplicate-metric phantom ties
    d_oh = jax.jit(make_scl_decoder(N, mask, L, jnp.float64,
                                    impl="scan-chunked", chunk=S,
                                    leaf_impl="onehot"))
    d_so = jax.jit(make_scl_decoder(N, mask, L, jnp.float64,
                                    impl="scan-chunked", chunk=S,
                                    leaf_impl="sort"))
    llr = rng.standard_normal((6, N)) * 1.5
    u_o, pm_o = d_oh(llr)
    u_s, pm_s = d_so(llr)
    np.testing.assert_array_equal(np.asarray(u_o), np.asarray(u_s))
    np.testing.assert_allclose(np.asarray(pm_o), np.asarray(pm_s), atol=0)


@pytest.mark.parametrize("N,L,S", [(64, 4, 16), (256, 8, 64)])
def test_scan_chunked_fused_control_exact(N, L, S, rng):
    # the fused (one-switch-per-chunk) control schedule must match the
    # NumPy twin and the split-switch schedule exactly — same descend/
    # body/ascend programs, just pre-combined per (descend, pattern,
    # ascend) triple
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan

    mask = _mask(N, N // 2 + 2)  # irregular K → distinct triples
    d_s = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S,
                                        dtype=jnp.float64,
                                        control_impl="split"))
    llr = rng.standard_normal((5, N)) * 1.5
    llr[0, :2] = 0.0
    u_s, pm_s = d_s(llr)
    for ctrl in ("fused", "unroll-fused"):
        d_f = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S,
                                            dtype=jnp.float64,
                                            control_impl=ctrl))
        u_f, pm_f = d_f(llr)
        np.testing.assert_array_equal(np.asarray(u_f), np.asarray(u_s))
        np.testing.assert_allclose(np.asarray(pm_f), np.asarray(pm_s),
                                   atol=0)
    for i in range(len(llr)):
        _, ref_m, ref_paths = scl_decode_np(llr[i], mask, L)
        np.testing.assert_allclose(np.asarray(pm_s)[i], ref_m, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(u_s)[i], ref_paths)


def test_sc_mega_kernel_bit_identical(rng):
    # whole-decode SC Pallas kernel (ops/sc_mega_pallas.py): the entire
    # recursion in one kernel, batch-last bit-reversed layout — must equal
    # the unrolled XLA fast path bit-for-bit on continuous noise
    # (interpret mode on CPU; hardware equality probed on TPU)
    from polarcode_and_ldpc_tpu.models.polar.sc import make_sc_decoder

    for N, K in [(64, 32), (256, 128)]:
        fm = frozen_mask_from_positions(
            N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
        llr = (rng.standard_normal((256, N)) * 2).astype(np.float32)
        u1 = np.asarray(jax.jit(make_sc_decoder(N, fm))(llr))
        u2 = np.asarray(jax.jit(make_sc_decoder(
            N, fm, impl="mega-interpret"))(llr))
        np.testing.assert_array_equal(u1, u2)


def test_sc_mega_unaligned_batch_falls_back(rng):
    # batches that don't fill the lane tile run the identical XLA twin
    from polarcode_and_ldpc_tpu.models.polar.sc import make_sc_decoder

    N, K = 128, 64
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((50, N)) * 2).astype(np.float32)
    u1 = np.asarray(jax.jit(make_sc_decoder(N, fm))(llr))
    u2 = np.asarray(jax.jit(make_sc_decoder(
        N, fm, impl="mega-interpret"))(llr))
    np.testing.assert_array_equal(u1, u2)


def test_sc_mega_hybrid_large_n(rng, monkeypatch):
    # codes too large for one kernel run HYBRID: XLA top splits + one
    # kernel per largest-fitting subtree — must stay bit-identical
    # (forced here by shrinking the VMEM budget so N=1024 -> sub_n=512)
    from polarcode_and_ldpc_tpu.ops import sc_mega_pallas as sm

    N, K = 1024, 512
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((256, N)) * 2).astype(np.float32)
    u_ref = np.asarray(jax.jit(make_sc_decoder(N, fm))(llr))
    monkeypatch.setattr(sm, "_SC_MEGA_VMEM_BUDGET", 3 * 1024 * 1024)
    u_h = np.asarray(jax.jit(
        sm.make_sc_decoder_mega(N, fm, interpret=True))(llr))
    np.testing.assert_array_equal(u_ref, u_h)
