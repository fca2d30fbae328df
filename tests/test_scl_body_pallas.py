"""Pallas-fused SCL chunk bodies (``ops/scl_body_pallas.py``) must be
bit-identical to the XLA bodies — the kernel traces the same jnp program
against VMEM refs, so any divergence is a harness bug.  Runs in interpret
mode on CPU; hardware equality is probed on TPU (tools/scl_perf_probe.py
--body pallas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.models.polar.construction import (
    bit_reverse_permutation,
    frozen_mask_from_positions,
)
from polarcode_and_ldpc_tpu.models.polar.scanscl import _make_chunk_body
from polarcode_and_ldpc_tpu.ops.scl_body_pallas import make_chunk_body_pallas


def test_pallas_body_bit_identical_flagship_chunk(rng):
    # the bench-config chunk shape (S=128, L=8) on a mixed frozen/info
    # pattern; interpret-mode cost scales with the traced op count, so the
    # densest flagship pattern lives in the smaller dense test below —
    # hardware equality at full density is probed on TPU
    # (tools/scl_pallas_ab.py)
    N, K, L, S = 1024, 512, 8, 128
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    flags = fm[bit_reverse_permutation(N)].reshape(N // S, S)[0]
    alpha = jnp.asarray(rng.standard_normal((L, S, 128)).astype(np.float32) * 2)
    pm = jnp.asarray(rng.standard_normal((L, 128)).astype(np.float32))
    pm = pm.at[2:].set(-np.inf)  # phantom paths present
    b1, p1, r1 = jax.jit(_make_chunk_body(flags, L, jnp.float32))(alpha, pm)
    b2, p2, r2 = jax.jit(make_chunk_body_pallas(
        flags, L, jnp.float32, interpret=True))(alpha, pm)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_pallas_body_bit_identical_dense_info(rng):
    # all-info chunk: every leaf branches + prunes — the maximal exercise
    # of the in-kernel one-hot loop algebra (selection, metric masking,
    # permutation composition) per op of interpret cost
    L, S = 4, 64
    flags = np.zeros(S, bool)
    alpha = jnp.asarray(rng.standard_normal((L, S, 128)).astype(np.float32) * 2)
    pm = jnp.asarray(rng.standard_normal((L, 128)).astype(np.float32))
    pm = pm.at[1:].set(-np.inf)
    b1, p1, r1 = jax.jit(_make_chunk_body(flags, L, jnp.float32))(alpha, pm)
    b2, p2, r2 = jax.jit(make_chunk_body_pallas(
        flags, L, jnp.float32, interpret=True))(alpha, pm)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_pallas_body_ties(rng):
    # adversarial zero-LLR ties: the stable tie-breaking must survive the
    # kernel path too
    N, K, L, S = 256, 128, 4, 64
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    flags = fm[bit_reverse_permutation(N)].reshape(N // S, S)[2]
    alpha = np.zeros((L, S, 128), np.float32)
    alpha[:, 1:, :] = rng.standard_normal((L, S - 1, 128)).astype(np.float32)
    alpha = jnp.asarray(alpha)
    pm = jnp.zeros((L, 128), jnp.float32).at[1:].set(-np.inf)
    b1, p1, r1 = jax.jit(_make_chunk_body(flags, L, jnp.float32))(alpha, pm)
    b2, p2, r2 = jax.jit(make_chunk_body_pallas(
        flags, L, jnp.float32, interpret=True))(alpha, pm)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_pallas_body_unaligned_batch_falls_back(rng):
    # batches that don't fill a 128-lane tile (tiny MC chunks) must still
    # decode — the body falls back to the XLA program, which is the same
    # math, so outputs stay bit-identical
    N, K, L, S = 256, 128, 4, 64
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    flags = fm[bit_reverse_permutation(N)].reshape(N // S, S)[1]
    alpha = jnp.asarray(rng.standard_normal((L, S, 48)).astype(np.float32) * 2)
    pm = jnp.zeros((L, 48), jnp.float32).at[1:].set(-np.inf)
    b1, p1, r1 = jax.jit(_make_chunk_body(flags, L, jnp.float32))(alpha, pm)
    b2, p2, r2 = jax.jit(make_chunk_body_pallas(
        flags, L, jnp.float32, interpret=True))(alpha, pm)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_superchunk_kernel_bit_identical(rng):
    # the whole-chunk-step superkernel (descend + body + composes +
    # ascend in ONE kernel, ops/scl_superchunk_pallas.py) must equal the
    # fused XLA control path bit-for-bit — interpret mode on CPU;
    # hardware equality is probed on TPU (tools/scl_perf_probe.py
    # --control kernel)
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )

    N, K, L, S = 128, 64, 4, 32
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((128, N)) * 1.5).astype(np.float32)
    llr[0, :3] = 0.0  # adversarial zero-LLR ties
    d_x = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="fused"))
    d_k = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="kernel-interpret"))
    u_x, m_x = d_x(llr)
    u_k, m_k = d_k(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_k))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_k))


def test_superchunk_unroll_slim_state_bit_identical(rng):
    # the straight-line unroll-kernel control elides dead alpha state
    # writes, slims invariant-parent reads to one slab, and emits chunk
    # 0's path-invariant planes as [1, M, B] with a lazy re-broadcast —
    # plus the fused last-chunk butterfly.  All of it must stay
    # bit-identical to the fused XLA control (interpret mode on CPU)
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )

    N, K, L, S = 256, 128, 4, 32  # C = 8 chunks: exercises invariants
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((128, N)) * 1.5).astype(np.float32)
    llr[0, :3] = 0.0
    d_x = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="unroll-fused"))
    d_k = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="unroll-kernel-interpret"))
    u_x, m_x = d_x(llr)
    u_k, m_k = d_k(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_k))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_k))


def test_superchunk_hybrid_vmem_gate(rng, monkeypatch):
    # kernel control modes gate each variant on its declared VMEM
    # footprint and fall back to the bit-identical fused-XLA program —
    # forcing the budget to 0 must route EVERY chunk step through the
    # fallback and still decode bit-exactly (large-N·L safety property)
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar import scanscl
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )
    from polarcode_and_ldpc_tpu.ops import scl_superchunk_pallas as sp

    N, K, L, S = 128, 64, 4, 32
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((64, N)) * 1.5).astype(np.float32)
    d_x = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="fused"))
    u_x, m_x = d_x(llr)
    monkeypatch.setattr(sp, "VMEM_OPERAND_BUDGET", 0)
    d_g = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="kernel-interpret"))
    u_g, m_g = d_g(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_g))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_g))


def test_mega_kernel_bit_identical(rng):
    # the whole-decode megakernel (ops/scl_mega_pallas.py): ENTIRE chunk
    # program in one Pallas kernel, level stacks as VMEM dataflow — must
    # equal the fused XLA control path bit-for-bit (interpret mode on CPU;
    # hardware equality probed on TPU via tools/scl_perf_probe.py
    # --control mega)
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )

    N, K, L, S = 128, 64, 4, 32
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((128, N)) * 1.5).astype(np.float32)
    llr[0, :3] = 0.0  # adversarial zero-LLR ties
    d_x = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="fused"))
    d_m = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="mega-interpret"))
    u_x, m_x = d_x(llr)
    u_m, m_m = d_m(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_m))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_m))


def test_mega_kernel_unaligned_batch_falls_back(rng):
    # batches that don't fill the 128-lane tile must route through the
    # bit-identical straight-line XLA program
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )

    N, K, L, S = 128, 64, 4, 32
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((48, N)) * 1.5).astype(np.float32)
    d_x = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="fused"))
    d_m = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="mega-interpret"))
    u_x, m_x = d_x(llr)
    u_m, m_m = d_m(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_m))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_m))


def test_mega_vmem_gate_degrades_to_hybrid(rng, monkeypatch):
    # a mega config whose live state exceeds the VMEM budget must degrade
    # to the hybrid per-chunk kernel mode and still decode bit-exactly
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )
    from polarcode_and_ldpc_tpu.ops import scl_mega_pallas as mp
    from polarcode_and_ldpc_tpu.ops import scl_superchunk_pallas as sp

    N, K, L, S = 128, 64, 4, 32
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    llr = (rng.standard_normal((64, N)) * 1.5).astype(np.float32)
    d_x = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="fused"))
    u_x, m_x = d_x(llr)
    monkeypatch.setattr(mp, "MEGA_VMEM_BUDGET", 0)
    # over-budget "mega" becomes "unroll-kernel"; force its per-variant
    # gate to 0 too so the degraded path runs fully on CPU-safe XLA
    monkeypatch.setattr(sp, "VMEM_OPERAND_BUDGET", 0)
    d_g = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                        control_impl="mega"))
    u_g, m_g = d_g(llr)
    np.testing.assert_array_equal(np.asarray(u_x), np.asarray(u_g))
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_g))


def test_rank_pendings_shrink_superkernel_vmem():
    # the rank algebra's pending state is [L, B] int32 instead of
    # [L, L, B] f32 — at L=32 this is what makes most chunk-step variants
    # fit the superkernel VMEM budget at all (N=4096 SCL-32: 3/63 →
    # 44/63 kernel-eligible steps measured at build time)
    import numpy as np

    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        _ctz,
        pend_liveness,
    )
    from polarcode_and_ldpc_tpu.ops.scl_superchunk_pallas import (
        VMEM_OPERAND_BUDGET,
        super_vmem_bytes,
    )

    N, L, S = 4096, 32, 64
    C = N // S
    t = int(np.log2(C))
    sizes = [N >> lv for lv in range(t + 1)]
    desc_k = np.array(
        [t if c == 0
         else (t + 1 + _ctz(c) if c == (1 << _ctz(c)) and _ctz(c) <= t - 2
               else _ctz(c))
         for c in range(C)], np.int32)
    asc_j = np.array([_ctz(c + 1) for c in range(C)], np.int32)
    ca, cb = pend_liveness(desc_k, asc_j, t, C)
    eligible = {}
    for perm in ("onehot", "rank"):
        eligible[perm] = sum(
            super_vmem_bytes(int(desc_k[c]), int(asc_j[c]), t, sizes, L,
                             jnp.float32, 128, compose_a=ca[c],
                             compose_b=cb[c], perm_impl=perm)
            <= VMEM_OPERAND_BUDGET
            for c in range(C - 1))
    assert eligible["rank"] > 3 * eligible["onehot"]
    assert eligible["rank"] >= 40  # pins the enabler, not the exact count


def test_superchunk_all_frozen_chunks(rng):
    # masks with ALL-FROZEN chunks (the N=4096 shape): their body R is the
    # identity, the schedule empties their compose masks, and the kernel
    # variants must still read the ascend-path pendings (round-4 touch-set
    # regression: pend_b inputs were implied only by the compose mask)
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        make_scl_decoder_scan,
    )
    from polarcode_and_ldpc_tpu.parity.polar_np import scl_decode_np

    N, K, L, S = 256, 64, 4, 32  # low rate → several all-frozen chunks
    fm = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, K, "bhattacharyya", 2.0)[0])
    from polarcode_and_ldpc_tpu.models.polar.construction import (
        bit_reverse_permutation,
    )
    flags = fm[np.asarray(bit_reverse_permutation(N))].reshape(N // S, S)
    assert flags.all(axis=1).any(), "mask has no all-frozen chunk"
    llr = (rng.standard_normal((128, N)) * 1.5).astype(np.float64)
    outs = []
    for ctrl in ("fused", "kernel-interpret", "unroll-kernel"):
        if ctrl == "unroll-kernel":
            # interpret-mode twin of the unroll-kernel schedule
            d = jax.jit(make_scl_decoder_scan(
                N, fm, L, chunk=S, dtype=jnp.float64,
                control_impl="kernel-interpret", mask_dedup="union"))
        else:
            d = jax.jit(make_scl_decoder_scan(N, fm, L, chunk=S,
                                              dtype=jnp.float64,
                                              control_impl=ctrl))
        outs.append(tuple(np.asarray(x) for x in d(llr)))
    for u, m in outs[1:]:
        np.testing.assert_array_equal(u, outs[0][0])
        np.testing.assert_array_equal(m, outs[0][1])
    _, ref_m, ref_paths = scl_decode_np(llr[0], fm, L)
    np.testing.assert_allclose(outs[0][1][0], ref_m, atol=1e-9)
    np.testing.assert_array_equal(outs[0][0][0], ref_paths)


def test_rank_gather_apply_large_list(rng):
    # L >= 16 XLA rank algebra applies permutations via take_along_axis
    # (rank vectors are SELECTIONS — duplicated sources after prunes — so
    # gather, never sort/scatter); must stay exact vs one-hot and the twin
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        _apply_perm_rank_gather,
        make_scl_decoder_scan,
        rank_algebra_for,
    )
    from polarcode_and_ldpc_tpu.parity.polar_np import scl_decode_np

    import os

    os.environ["FEC_RANK_GATHER_MIN_L"] = "16"
    try:
        assert (rank_algebra_for(32)["apply_perm"]
                is _apply_perm_rank_gather
                and rank_algebra_for(8)["apply_perm"]
                is not _apply_perm_rank_gather)
    finally:
        del os.environ["FEC_RANK_GATHER_MIN_L"]
    # gather stays OFF by default — measured 186x SLOWER on v5e (XLA
    # scalarizes per-lane-index gathers); kept only as an A/B knob
    assert rank_algebra_for(32)["apply_perm"] is not _apply_perm_rank_gather
    N, L, S = 256, 32, 64
    mask = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, 140, "bhattacharyya", 2.0)[0])
    llr = rng.standard_normal((3, N)) * 1.5
    llr[0, :3] = 0.0
    import os

    os.environ["FEC_RANK_GATHER_MIN_L"] = "16"
    try:
        d_r = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S,
                                            dtype=jnp.float64,
                                            leaf_impl="sort",
                                            perm_impl="rank"))
    finally:
        del os.environ["FEC_RANK_GATHER_MIN_L"]
    d_o = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S,
                                        dtype=jnp.float64, leaf_impl="sort",
                                        perm_impl="onehot"))
    u_r, m_r = d_r(llr)
    u_o, m_o = d_o(llr)
    np.testing.assert_array_equal(np.asarray(u_r), np.asarray(u_o))
    np.testing.assert_array_equal(np.asarray(m_r), np.asarray(m_o))
    _, rm, rp = scl_decode_np(llr[1], mask, L)
    np.testing.assert_allclose(np.asarray(m_r)[1], rm, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(u_r)[1], rp)


def test_rank_matmul_apply_large_list(rng):
    # the MXU one-hot-matmul apply (FEC_RANK_MATMUL_MIN_L) must be
    # bit-identical to the select-sum form: one-hot rows select exactly
    # one finite payload, and the >=3-pass f32 matmul reassembles that
    # payload's split pieces exactly (see _apply_perm_rank_matmul)
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.models.polar.scanscl import (
        _apply_perm_rank_matmul,
        make_scl_decoder_scan,
        rank_algebra_for,
    )
    from polarcode_and_ldpc_tpu.parity.polar_np import scl_decode_np

    import os

    # default OFF pending v5e measurements; opt-in threshold behavior
    assert rank_algebra_for(32)["apply_perm"] is not _apply_perm_rank_matmul
    N, L, S = 256, 32, 64
    mask = frozen_mask_from_positions(
        N, fec.construct_polar_code(N, 140, "bhattacharyya", 2.0)[0])
    llr = rng.standard_normal((3, N)) * 1.5
    llr[0, :3] = 0.0
    os.environ["FEC_RANK_MATMUL_MIN_L"] = "16"
    try:
        assert (rank_algebra_for(32)["apply_perm"]
                is _apply_perm_rank_matmul
                and rank_algebra_for(8)["apply_perm"]
                is not _apply_perm_rank_matmul)
        d_m = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S,
                                            dtype=jnp.float64,
                                            leaf_impl="sort",
                                            perm_impl="rank"))
    finally:
        del os.environ["FEC_RANK_MATMUL_MIN_L"]
    d_o = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=S,
                                        dtype=jnp.float64, leaf_impl="sort",
                                        perm_impl="onehot"))
    u_m, m_m = d_m(llr)
    u_o, m_o = d_o(llr)
    np.testing.assert_array_equal(np.asarray(u_m), np.asarray(u_o))
    np.testing.assert_array_equal(np.asarray(m_m), np.asarray(m_o))
    _, rm, rp = scl_decode_np(llr[1], mask, L)
    np.testing.assert_allclose(np.asarray(m_m)[1], rm, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(u_m)[1], rp)


@pytest.mark.parametrize("L", [4, 64])
def test_transform_lnb_wide_list(rng, L):
    # the final-butterfly helper has two branches: bit-packed (L <= 32,
    # the shipped kernel path) and per-path unpacked (L > 32, reachable
    # only by hypothetical wide-list callers).  Both must equal the public
    # polar_transform under the storage convention (bit-reversed rows;
    # callers un-permute at the JAX level) — ADVICE r4 #3 coverage.
    from polarcode_and_ldpc_tpu.models.polar.encoder import polar_transform
    from polarcode_and_ldpc_tpu.models.polar.scanscl import _transform_lnb

    N, B = 32, 5
    rev = np.asarray(bit_reverse_permutation(N))
    beta_lnb = jnp.asarray(rng.integers(0, 2, (L, N, B)), jnp.int8)
    out = np.asarray(_transform_lnb(beta_lnb))           # [L, N, B]
    u_nat = np.transpose(out, (2, 0, 1))[..., rev]       # [B, L, N]
    beta_nat = np.transpose(np.asarray(beta_lnb), (2, 0, 1))[..., rev]
    expect = np.asarray(polar_transform(jnp.asarray(beta_nat)))
    np.testing.assert_array_equal(u_nat, expect)
