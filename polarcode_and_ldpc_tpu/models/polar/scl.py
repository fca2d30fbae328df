"""Successive-cancellation list (SCL) and CRC-aided SCL polar decoders.

Re-design of the reference's SCL (``src/polar/decoder.py:176-444``) for TPU:

* the list dimension is a tensor axis ``[batch, L, n+1, N]`` — every path's
  trellis updates run as one vectorized stage, not a Python loop over paths
  (reference loops at ``decoder.py:267-281, 293-297``);
* the candidate sort-and-prune (Python stable sort + full matrix copies at
  ``decoder.py:306-339``) becomes a stable ``argsort`` over ``[batch, 2L]``
  metrics followed by a ``take_along_axis`` gather across the list axis;
* path metrics use the reference's numerically-stable log-likelihood
  (``decoder.py:374-406``), which is exactly ``−logaddexp(0, ∓llr)``.

Inactive paths are carried as "phantom" slots with metric −inf (the reference
tracks an explicit active mask, ``decoder.py:223,319``): a phantom's candidate
metric stays −inf forever, so phantoms sort strictly after every real
candidate and the surviving real paths (and their relative stable order)
match the reference exactly.

CRC-aided selection is a documented *gap* in the reference (``decode`` never
consults the CRC — ``docs/SCL_DECODER_README.md:67``); implemented here:
pick the best-metric path among CRC-passing ones, falling back to the best
metric overall when none pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .construction import frozen_mask_from_positions, generate_frozen_bits
from .crc import CRCCodec
from .schedule import build_schedule
from .trellis import leaf_llr, propagate_bits, set_leaf_bit, update_llr_columns

_NEG_INF = -jnp.inf


def _log_likelihood_deltas(llr):
    """(log P(bit=0|llr), log P(bit=1|llr)) — reference ``decoder.py:374-406``."""
    zero = jnp.zeros_like(llr)
    return -jnp.logaddexp(zero, -llr), -jnp.logaddexp(zero, llr)


def select_best_path(info_paths, metrics, crc=None):
    """Pick one path per frame: best metric (reference ``decoder.py:259``),
    or — with a ``CRCCodec`` — the best-metric CRC-passing path, falling
    back to metric-argmax when none pass (CA-SCL; a documented reference
    gap).  ``info_paths [B, L, K] → [B, K]``."""
    best = jnp.argmax(metrics, axis=-1)
    if crc is not None:
        ok = crc.check(info_paths)  # [B, L]
        eff = jnp.where(ok, metrics, _NEG_INF)
        best = jnp.where(jnp.any(ok, axis=-1), jnp.argmax(eff, axis=-1), best)
    return jnp.take_along_axis(info_paths, best[:, None, None], axis=1)[:, 0, :]


def make_scl_decoder(N: int, frozen_mask: np.ndarray, list_size: int,
                     dtype=jnp.float32, impl: str = "unrolled",
                     chunk: int = 128, body_impl: str = "xla",
                     leaf_impl: str = "onehot", control_impl: str = "split",
                     batch_tile: int = 128, node_mode: str = "exact",
                     perm_impl: str = "rank", mask_dedup: str = "exact",
                     live_width="auto"):
    """Build a jittable SCL decoder.

    Returns ``decode(llr: [batch, N]) -> (u: [batch, L, N] int8,
    metrics: [batch, L])`` with paths sorted by selection slot (slot 0 is not
    necessarily the best path; use the metrics / CRC to select).

    ``impl``: ``"unrolled"`` (default — recursive fast path with lazy path-
    permutation composition, see ``fastscl.py``), ``"scan-chunked"`` (the
    compile-light ``lax.scan``-over-subtrees fast path, ``scanscl.py`` —
    compile cost independent of N/batch, so large batches and large N are
    affordable; ``chunk`` sets the subtree size), or ``"scan"`` (the
    reference-trellis formulation below).  Bit-identical outputs.

    ``leaf_impl`` (scan-chunked only): ``"onehot"`` ranks info-leaf
    candidates by all-pairs comparison (O(L²) element-ops, no gathers);
    ``"sort"`` uses a stable ``lax.sort`` (O(L log L) — wins at large L,
    e.g. SCL-32).  Bit-identical outputs either way.

    ``node_mode="fast"`` (scan-chunked only) enables the SSCL fast list
    nodes — an *approximate* serving mode, see
    ``scanscl.make_scl_decoder_scan``.

    ``perm_impl`` (scan-chunked only; bit-identical outputs): ``"rank"``
    (default) carries list permutations as int32 rank vectors — L× less
    pending state and L× cheaper composition than ``"onehot"``.
    """
    if node_mode != "exact":
        assert impl == "scan-chunked", \
            "node_mode='fast' requires impl='scan-chunked'"
    if impl == "unrolled":
        from .fastscl import make_scl_decoder_unrolled

        return make_scl_decoder_unrolled(N, frozen_mask, list_size, dtype)
    if impl == "scan-chunked":
        from .scanscl import make_scl_decoder_scan

        return make_scl_decoder_scan(N, frozen_mask, list_size, chunk, dtype,
                                     leaf_impl=leaf_impl, body_impl=body_impl,
                                     control_impl=control_impl,
                                     batch_tile=batch_tile,
                                     node_mode=node_mode,
                                     perm_impl=perm_impl,
                                     mask_dedup=mask_dedup,
                                     live_width=live_width)
    assert impl == "scan", f"unknown impl {impl!r}"
    sched = build_schedule(N, frozen_mask)
    n, Lsz = sched.n, list_size
    xs = {
        "leaf": jnp.asarray(sched.leaf),
        "frozen": jnp.asarray(sched.frozen),
        "llr_act": jnp.asarray(sched.llr_active),
        "bit_act": jnp.asarray(sched.bit_active),
    }

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        assert llr.ndim == 2, "SCL decode expects [batch, N]"
        batch = llr.shape[0]
        L = jnp.zeros((batch, Lsz, n + 1, N), dtype)
        L = L.at[..., 0, :].set(llr[:, None, :])  # all paths see the channel (decoder.py:243-245)
        B = jnp.zeros((batch, Lsz, n + 1, N), jnp.int8)
        pm = jnp.full((batch, Lsz), _NEG_INF, dtype)
        pm = pm.at[:, 0].set(0.0)  # one active path (decoder.py:237-241)

        def frozen_step(carry, x):
            L, B, pm = carry
            l = x["leaf"]
            L = update_llr_columns(L, B, l, x["llr_act"])
            dec_llr = leaf_llr(L, l)  # [batch, Lsz]
            d0, _ = _log_likelihood_deltas(dec_llr)
            pm = pm + d0  # −inf + finite = −inf keeps phantoms inert (decoder.py:277-278)
            B = set_leaf_bit(B, l, jnp.zeros_like(pm, jnp.int8))
            B = propagate_bits(B, l, x["bit_act"])
            return (L, B, pm)

        def info_step(carry, x):
            L, B, pm = carry
            l = x["leaf"]
            L = update_llr_columns(L, B, l, x["llr_act"])
            dec_llr = leaf_llr(L, l)  # [batch, Lsz]
            d0, d1 = _log_likelihood_deltas(dec_llr)
            # candidate order = [bit-0 paths..., bit-1 paths...] — matches the
            # reference's insertion order into its stable sort (decoder.py:299-307)
            cand = jnp.concatenate([pm + d0, pm + d1], axis=-1)  # [batch, 2L]
            order = jnp.argsort(-cand, axis=-1, stable=True)[:, :Lsz]
            src = (order % Lsz).astype(jnp.int32)
            bits = (order // Lsz).astype(jnp.int8)
            pm = jnp.take_along_axis(cand, order, axis=-1)
            gather = src[:, :, None, None]
            L = jnp.take_along_axis(L, gather, axis=1)
            B = jnp.take_along_axis(B, gather, axis=1)
            B = set_leaf_bit(B, l, bits)
            B = propagate_bits(B, l, x["bit_act"])
            return (L, B, pm)

        def step(carry, x):
            carry = lax.cond(x["frozen"], frozen_step, info_step, carry, x)
            return carry, None

        (L, B, pm), _ = lax.scan(step, (L, B, pm), xs)
        return B[..., n, :], pm

    return decode


class SCLDecoder:
    """Batched SCL decoder (reference API: ``src/polar/decoder.py:176-444``).

    With ``use_crc=True`` this performs true CA-SCL path selection (the
    reference only advertises it; see module docstring).

    ``chunk``/``body_impl`` tune the ``"scan-chunked"`` fast path:
    ``body_impl="pallas"`` runs the per-chunk subtree bodies as fused
    VMEM-resident TPU kernels (``ops/scl_body_pallas.py``) — bit-identical
    outputs, ~30% faster on v5e, ~3× the compile time.
    """

    def __init__(self, N: int, K: int, list_size: int = 8,
                 frozen_bits: Optional[np.ndarray] = None,
                 use_crc: bool = False, crc_polynomial: str = "CRC-8",
                 dtype=jnp.float32, impl: Optional[str] = None,
                 chunk: int = 128, body_impl: str = "xla",
                 leaf_impl: str = "onehot", control_impl: str = "split",
                 node_mode: str = "exact", perm_impl: str = "rank"):
        if impl is None:  # auto: compile-light chunk-scan for large codes
            impl = ("scan-chunked" if N >= 512 or node_mode == "fast"
                    else "unrolled")
        assert N > 0 and (N & (N - 1)) == 0, "N must be a power of 2"
        assert 0 < K < N, "K must be in (0, N)"
        assert list_size >= 1
        self.N = N
        self.K = K
        self.L = list_size
        self.n = int(np.log2(N))
        self.use_crc = use_crc
        self.crc_polynomial = crc_polynomial
        if frozen_bits is None:
            self.frozen_bits, self.info_bits = generate_frozen_bits(N, K)
        else:
            self.frozen_bits = np.sort(np.asarray(frozen_bits, dtype=np.int64))
            self.info_bits = np.setdiff1d(np.arange(N), self.frozen_bits)
        self.frozen_mask = frozen_mask_from_positions(N, self.frozen_bits)
        self.dtype = dtype
        self._info_idx = jnp.asarray(self.info_bits, jnp.int32)
        crc_len = int(crc_polynomial.split("-")[1]) if use_crc else 0
        self._crc = CRCCodec(K - crc_len, crc_polynomial) if use_crc else None
        self.node_mode = node_mode
        self._decode_paths = jax.jit(make_scl_decoder(
            N, self.frozen_mask, list_size, dtype, impl=impl,
            chunk=min(chunk, N), body_impl=body_impl, leaf_impl=leaf_impl,
            control_impl=control_impl, node_mode=node_mode,
            perm_impl=perm_impl))
        self._select = jax.jit(self._select_impl)

    def _select_impl(self, u_paths, metrics):
        info = u_paths[..., self._info_idx]  # [batch, L, K]
        return select_best_path(info, metrics, self._crc)

    def decode_paths(self, llr):
        """All surviving paths: ``(u [batch, L, N], metrics [batch, L])``."""
        llr = jnp.atleast_2d(jnp.asarray(llr, self.dtype))
        return self._decode_paths(llr)

    def decode(self, llr):
        """Best-path info bits ``[..., K]`` (reference ``decoder.py:225-262``)."""
        llr = jnp.asarray(llr, self.dtype)
        squeeze = llr.ndim == 1
        u_paths, metrics = self._decode_paths(jnp.atleast_2d(llr))
        out = self._select(u_paths, metrics)
        return out[0] if squeeze else out

    def __repr__(self) -> str:
        return (f"SCLDecoder(N={self.N}, K={self.K}, L={self.L}, "
                f"use_crc={self.use_crc})")


class CASCLDecoder(SCLDecoder):
    """CRC-aided SCL (named in reference ``ARCHITECTURE.md:27``, never built
    there).  Equivalent to ``SCLDecoder(..., use_crc=True)``."""

    def __init__(self, N: int, K: int, list_size: int = 8,
                 frozen_bits: Optional[np.ndarray] = None,
                 crc_polynomial: str = "CRC-8", dtype=jnp.float32):
        super().__init__(N, K, list_size, frozen_bits, True, crc_polynomial, dtype)
