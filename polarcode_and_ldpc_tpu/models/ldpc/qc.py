"""Quasi-cyclic LDPC belief propagation — the large-code TPU fast path.

The generic decoder (``bp.py`` + ``graph.py``) moves messages between
check-major and var-major layouts through static gathers, or one-hot
permute matmuls for codes up to ~4096 edge slots.  Neither scales to the
n=8192 configuration (BASELINE.json configs[4]): the permute matrix would
be ~600 MB and flat gathers lower to slow scalar code on TPU.

For quasi-cyclic codes the permutation *is* structure: every H block is a
circulant ``roll(I_z, s)``, so moving a z-block of messages between layouts
is ``jnp.roll(block, ±s)`` — a lane rotation XLA lowers to cheap
slice+concat, no gathers, no matmuls.  Messages live check-major as
``[batch, mb, dc, z]`` (z on the lane axis); one BP iteration is a static
loop over the *base-graph* edges (a few dozen) of roll/add ops plus the
same leave-one-out reductions as the generic decoder.

Numerics are kept bit-compatible with ``bp.py`` (same clip/±20 saturation,
same exclusive-product order — base edges are enumerated in ascending
variable/check order exactly as ``graph.py`` orders neighbor slots), so a
QC code decodes identically through either path; tests enforce it.

Reference semantics: ``/root/reference/src/ldpc/decoder.py:11-205`` (BP),
``:208-355`` (min-sum); the QC structure itself is a reference config gap
(``config/ldpc_config.yaml`` advertises ``qc_ldpc``; never implemented).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .bp import bp_check_update
from .minsum import ms_check_update


def _base_edges(base: np.ndarray):
    """Edge lists of the base graph.

    Returns ``(check_rows, var_cols)``: ``check_rows[bi]`` is the list of
    ``(bj, shift, slot_in_var)`` ascending in bj; ``var_cols[bj]`` the list
    of ``(bi, slot_in_check, shift)`` ascending in bi.  Slot orders match
    ``graph.TannerGraph.from_H`` neighbor ordering (ascending indices), so
    reduction orders — and therefore float32 results — agree with the
    generic decoder.
    """
    base = np.asarray(base)
    mb, nb = base.shape
    check_rows = [[(bj, int(base[bi, bj])) for bj in range(nb)
                   if base[bi, bj] >= 0] for bi in range(mb)]
    var_cols = [[(bi, int(base[bi, bj])) for bi in range(mb)
                 if base[bi, bj] >= 0] for bj in range(nb)]
    slot_in_check = {}
    for bi, row in enumerate(check_rows):
        for s_c, (bj, _) in enumerate(row):
            slot_in_check[(bi, bj)] = s_c
    slot_in_var = {}
    for bj, col in enumerate(var_cols):
        for s_v, (bi, _) in enumerate(col):
            slot_in_var[(bi, bj)] = s_v
    rows = [[(bj, sh, slot_in_var[(bi, bj)]) for (bj, sh) in row]
            for bi, row in enumerate(check_rows)]
    cols = [[(bi, slot_in_check[(bi, bj)], sh) for (bi, sh) in col]
            for bj, col in enumerate(var_cols)]
    return rows, cols


def make_qc_bp_decoder(base: np.ndarray, z: int, max_iter: int = 50,
                       early_stop: bool = True, dtype=jnp.float32,
                       variant: str = "bp", normalization: float = 1.0,
                       offset: float = 0.0, schedule: str = "flooding"):
    """Build a jittable roll-based BP/min-sum decoder for a QC code.

    ``base`` is the ``[mb, nb]`` shift matrix (−1 = no edge) from
    ``matrix.qc_base_matrix``; the code length is ``nb·z``.  Returns
    ``decode(llr [batch, n]) → (bits [batch, n] int8, iters [batch] int32)``
    with the exact early-stop latching semantics of ``bp.make_bp_decoder``
    (per-frame first-converged outputs, reference ``decoder.py:124-202``).

    ``schedule="layered"`` (min-sum only): the base rows ARE the layers —
    each block row touches every variable block at most once, so the
    within-layer parallel update is conflict-free by construction.
    Bit-identical (bits + iteration counts) to the generic layered decoder
    (``layered.py``) on the expanded H with ``num_layers = mb``; flooding
    stays the reference-exact default.
    """
    base = np.asarray(base)
    mb, nb = base.shape
    rows, cols = _base_edges(base)
    assert schedule in ("flooding", "layered"), schedule
    if schedule == "layered":
        assert variant in ("ms", "nms", "oms", "min-sum"), \
            "layered schedule is min-sum only"
    dcs = {len(r) for r in rows}
    dvs = {len(c) for c in cols}
    assert len(dcs) == 1 and len(dvs) == 1, (
        "roll-based QC BP expects a regular base graph; use the generic "
        "TannerGraph decoder for irregular codes")
    dc, dv = dcs.pop(), dvs.pop()
    n = nb * z
    mask = jnp.ones((mb, 1, dc), bool)  # regular rows: no padded slots

    # the leave-one-out reductions run along the LAST axis; messages live
    # [B, mb, dc, z] (z on lanes for the rolls), so transpose dc last for
    # the update and back
    if variant == "bp":
        update = lambda msgs: bp_check_update(msgs, mask, dtype)
    elif variant in ("ms", "nms", "oms", "min-sum"):
        update = lambda msgs: ms_check_update(msgs, mask, normalization,
                                              offset, dtype)
    else:
        raise ValueError(f"unknown QC BP variant {variant!r}")

    def check_update(msgs):
        return update(msgs.swapaxes(-1, -2)).swapaxes(-1, -2)

    def to_check_major(blocks):
        """var blocks ``[B, nb, z]`` → check-major ``[B, mb, dc, z]``:
        check r of block (bi, bj, s) reads variable (r + s) mod z."""
        per_row = []
        for bi in range(mb):
            per_row.append(jnp.stack(
                [jnp.roll(blocks[:, bj], -sh, axis=-1)
                 for (bj, sh, _sv) in rows[bi]], axis=1))
        return jnp.stack(per_row, axis=1)  # [B, mb, dc, z]

    def _syndrome_latch(s, bits_blocks, batch, extra):
        """Shared per-iteration syndrome check + first-converged latching
        (reference decoder.py:191-202)."""
        bits = bits_blocks.reshape(batch, n)
        syn = jnp.zeros((batch, mb, z), jnp.int32)
        for bi in range(mb):
            for (bj, sh, _sv) in rows[bi]:
                syn = syn.at[:, bi].add(
                    jnp.roll(bits_blocks[:, bj], -sh, axis=-1)
                    .astype(jnp.int32))
        ok = jnp.all((syn % 2) == 0, axis=(1, 2))
        newly = ok & ~s["done"]
        return dict(
            it=s["it"] + 1,
            bits=bits,
            done=s["done"] | ok,
            latched=jnp.where(newly[:, None], bits, s["latched"]),
            iters=jnp.where(newly, s["it"] + 1, s["iters"]),
            **extra,
        )

    def decode_layered(llr):
        llr = jnp.asarray(llr, dtype)
        assert llr.ndim == 2 and llr.shape[1] == n, f"expected [batch, {n}]"
        batch = llr.shape[0]
        bits0 = (llr <= 0).astype(jnp.int8)
        row_mask = jnp.ones((1, dc), bool)
        state = dict(
            it=jnp.zeros((), jnp.int32),
            Q=llr.reshape(batch, nb, z),
            R=jnp.zeros((batch, mb, dc, z), dtype),
            bits=bits0,
            done=jnp.zeros((batch,), bool),
            latched=bits0,
            iters=jnp.full((batch,), max_iter, jnp.int32),
        )

        def one_iteration(s):
            Q, R = s["Q"], s["R"]
            for bi in range(mb):  # base rows ARE the layers (conflict-free)
                q_cm = jnp.stack(
                    [jnp.roll(Q[:, bj], -sh, axis=-1)
                     for (bj, sh, _sv) in rows[bi]], axis=1)  # [B, dc, z]
                qt = q_cm - R[:, bi]
                r_new = ms_check_update(qt.swapaxes(-1, -2), row_mask,
                                        normalization, offset,
                                        dtype).swapaxes(-1, -2)
                delta = r_new - R[:, bi]
                R = R.at[:, bi].set(r_new)
                for si, (bj, sh, _sv) in enumerate(rows[bi]):
                    Q = Q.at[:, bj].add(jnp.roll(delta[:, si], sh, axis=-1))
            return _syndrome_latch(s, (Q <= 0).astype(jnp.int8), batch,
                                   dict(Q=Q, R=R))

        return _run_loop(state, one_iteration, batch)

    def _run_loop(state, one_iteration, batch):
        if early_stop:
            def cond(s):
                return (s["it"] < max_iter) & ~jnp.all(s["done"])
            state = lax.while_loop(cond, one_iteration, state)
            bits = jnp.where(state["done"][:, None], state["latched"],
                             state["bits"])
            iters = state["iters"]
        else:
            state = lax.fori_loop(0, max_iter, lambda _, s: one_iteration(s),
                                  state)
            bits = state["bits"]
            iters = jnp.full((batch,), max_iter, jnp.int32)
        return bits, iters

    if schedule == "layered":
        return decode_layered

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        assert llr.ndim == 2 and llr.shape[1] == n, f"expected [batch, {n}]"
        batch = llr.shape[0]
        llr_blocks = llr.reshape(batch, nb, z)
        v2c = to_check_major(llr_blocks)  # init: v2c = channel LLR
        bits0 = (llr <= 0).astype(jnp.int8)
        state = dict(
            it=jnp.zeros((), jnp.int32),
            v2c=v2c,
            bits=bits0,
            done=jnp.zeros((batch,), bool),
            latched=bits0,
            iters=jnp.full((batch,), max_iter, jnp.int32),
        )

        def one_iteration(s):
            c2v = check_update(s["v2c"])  # [B, mb, dc, z]
            # variable totals: llr + Σ incident c2v, ascending check order
            # (mirrors graph.py var-major slot order for exact parity)
            totals = []
            for bj in range(nb):
                contrib = jnp.stack(
                    [jnp.roll(c2v[:, bi, sc], sh, axis=-1)
                     for (bi, sc, sh) in cols[bj]], axis=1)  # [B, dv, z]
                totals.append(llr_blocks[:, bj] + jnp.sum(contrib, axis=1))
            totals = jnp.stack(totals, axis=1)  # [B, nb, z]
            # v2c = total − self (reference decoder.py:98-122)
            v2c_new = to_check_major(totals) - c2v
            bits_blocks = (totals <= 0).astype(jnp.int8)
            bits = bits_blocks.reshape(batch, n)
            # syndrome per check block: XOR of connected variable bits
            syn = jnp.zeros((batch, mb, z), jnp.int32)
            for bi in range(mb):
                for (bj, sh, _sv) in rows[bi]:
                    syn = syn.at[:, bi].add(
                        jnp.roll(bits_blocks[:, bj], -sh, axis=-1)
                        .astype(jnp.int32))
            ok = jnp.all((syn % 2) == 0, axis=(1, 2))
            newly = ok & ~s["done"]
            return dict(
                it=s["it"] + 1,
                v2c=v2c_new,
                bits=bits,
                done=s["done"] | ok,
                latched=jnp.where(newly[:, None], bits, s["latched"]),
                iters=jnp.where(newly, s["it"] + 1, s["iters"]),
            )

        if early_stop:
            def cond(s):
                return (s["it"] < max_iter) & ~jnp.all(s["done"])
            state = lax.while_loop(cond, one_iteration, state)
            bits = jnp.where(state["done"][:, None], state["latched"],
                             state["bits"])
            iters = state["iters"]
        else:
            state = lax.fori_loop(0, max_iter, lambda _, s: one_iteration(s),
                                  state)
            bits = state["bits"]
            iters = jnp.full((batch,), max_iter, jnp.int32)
        return bits, iters

    return decode


class QCBPDecoder:
    """Roll-based QC-LDPC decoder (BP or min-sum) for large codes.

    Construct from a shift matrix (``matrix.qc_base_matrix``) + lift size.
    ``.H`` exposes the dense parity-check for the encoder path.
    """

    def __init__(self, base: np.ndarray, z: int, max_iter: int = 50,
                 early_stop: bool = True, dtype=jnp.float32,
                 variant: str = "bp", normalization: float = 1.0,
                 offset: float = 0.0, schedule: str = "flooding"):
        from .matrix import qc_expand

        self.base = np.asarray(base)
        self.z = z
        self.mb, self.nb = self.base.shape
        self.n = self.nb * z
        self.m = self.mb * z
        self.max_iter = max_iter
        self.variant = variant
        self.schedule = schedule
        self.dtype = dtype
        self._H: Optional[np.ndarray] = None
        self._expand = lambda: qc_expand(self.base, self.z)
        self._decode = jax.jit(make_qc_bp_decoder(
            base, z, max_iter, early_stop, dtype, variant, normalization,
            offset, schedule))

    @property
    def H(self) -> np.ndarray:
        if self._H is None:
            self._H = self._expand()
        return self._H

    def decode(self, llr, return_iterations: bool = False):
        llr = jnp.asarray(llr, self.dtype)
        squeeze = llr.ndim == 1
        bits, iters = self._decode(jnp.atleast_2d(llr))
        if squeeze:
            bits, iters = bits[0], iters[0]
        return (bits, iters) if return_iterations else bits

    def __repr__(self) -> str:
        return (f"QCBPDecoder(n={self.n}, m={self.m}, z={self.z}, "
                f"variant={self.variant!r}, max_iter={self.max_iter})")
