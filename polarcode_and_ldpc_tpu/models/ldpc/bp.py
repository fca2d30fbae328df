"""Belief-propagation (sum-product) LDPC decoder, batched for TPU.

Re-design of the reference BP (``src/ldpc/decoder.py:11-205``): the per-node
Python loops become dense padded-edge tensor ops (see ``graph.py``), with
semantics preserved exactly:

* check update ``2·atanh(Π_{v'≠v} tanh(m/2))`` with tanh clipped to
  ±0.999999 pre- and post-product and ±20 infinity saturation
  (``decoder.py:79-94``); the leave-one-out product is computed by exclusive
  prefix/suffix products (no division — exact even with zero messages);
* variable update total-minus-self (``decoder.py:98-122``);
* hard decision ``total ≤ 0 → 1`` (``decoder.py:191``);
* early stop on zero syndrome with per-frame actual iteration counts
  (``decoder.py:124-131, 194-202``) — frames in a batch latch their first
  converged output independently; the device loop exits early only when
  *every* frame in the batch has converged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .graph import TannerGraph

_TANH_CLIP = 0.999999
_SAT = 20.0


def _exclusive_products(x, mask):
    """Leave-one-out products along the last axis (masked slots → 1)."""
    x = jnp.where(mask, x, jnp.ones_like(x))
    left = jnp.cumprod(x, axis=-1)
    right = jnp.cumprod(jnp.flip(x, -1), axis=-1)
    right = jnp.flip(right, -1)
    one = jnp.ones_like(x[..., :1])
    excl_left = jnp.concatenate([one, left[..., :-1]], axis=-1)
    excl_right = jnp.concatenate([right[..., 1:], one], axis=-1)
    return excl_left * excl_right


def bp_check_update(v2c_checkmajor, mask, dtype):
    """Sum-product check-node update (reference ``decoder.py:62-96``)."""
    t = jnp.tanh(v2c_checkmajor / 2.0)
    t = jnp.clip(t, -_TANH_CLIP, _TANH_CLIP)
    prod = _exclusive_products(t, mask)
    prod = jnp.clip(prod, -_TANH_CLIP, _TANH_CLIP)
    out = 2.0 * jnp.arctanh(prod)
    # reference nan_to_num(nan=0, posinf=20, neginf=-20); clipped atanh is
    # finite but keep the exact same saturation for safety
    return jnp.nan_to_num(out, nan=0.0, posinf=_SAT, neginf=-_SAT).astype(dtype)


def make_bp_decoder(graph: TannerGraph, max_iter: int = 50, early_stop: bool = True,
                    dtype=jnp.float32, check_update=None):
    """Build a jittable BP decoder for a fixed Tanner graph.

    Returns ``decode(llr: [batch, n]) -> (bits [batch, n] int8,
    iters [batch] int32)``.
    """
    if check_update is None:
        check_update = lambda msgs, mask: bp_check_update(msgs, mask, dtype)
    g = graph

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        assert llr.ndim == 2, "decode expects [batch, n]"
        batch = llr.shape[0]
        v2c = jnp.broadcast_to(llr[..., None], (batch, g.n, g.dv_max)).astype(dtype)
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
            # 1. check-node update (reference decoder.py:150-168)
            v2c_cm = g.gather_var_to_check(s["v2c"])
            c2v_cm = check_update(v2c_cm, g.check_mask)
            # 2. variable-node update (decoder.py:171-188)
            c2v_vm = g.gather_check_to_var(c2v_cm)
            c2v_vm = jnp.where(g.var_mask, c2v_vm, jnp.zeros_like(c2v_vm))
            totals = llr + jnp.sum(c2v_vm, axis=-1)
            v2c = totals[..., None] - c2v_vm
            # 3. hard decision (decoder.py:191)
            bits = (totals <= 0).astype(jnp.int8)
            # 4. convergence (decoder.py:194-198)
            ok = jnp.all(g.syndrome(bits) == 0, axis=-1)
            newly = ok & ~s["done"]
            return dict(
                it=s["it"] + 1,
                v2c=v2c,
                bits=bits,
                done=s["done"] | ok,
                latched=jnp.where(newly[:, None], bits, s["latched"]),
                iters=jnp.where(newly, s["it"] + 1, s["iters"]),
            )

        if early_stop:
            def cond(s):
                return (s["it"] < max_iter) & ~jnp.all(s["done"])
            state = lax.while_loop(cond, one_iteration, state)
            bits = jnp.where(state["done"][:, None], state["latched"], state["bits"])
            iters = state["iters"]
        else:
            state = lax.fori_loop(0, max_iter, lambda _, s: one_iteration(s), state)
            bits = state["bits"]
            iters = jnp.full((batch,), max_iter, jnp.int32)
        return bits, iters

    return decode


class BPDecoder:
    """Batched sum-product decoder (reference API:
    ``src/ldpc/decoder.py:11-205``).

    ``impl``: ``"xla"`` (portable default), ``"pallas"`` (the fused TPU
    kernel in ``ops/bp_pallas.py`` — bit-identical, requires a TPU backend
    and a code whose padded-edge tensors fit VMEM), or ``"auto"`` (pallas
    when available, else xla).
    """

    # Pallas check rule / schedule; the min-sum subclasses (minsum.MSDecoder,
    # layered.LayeredMSDecoder) override these — the resolve/run/decode
    # machinery below is shared.
    _check_rule = "bp"
    _schedule = "flooding"
    normalization = 1.0
    offset = 0.0
    num_layers = 4

    def __init__(self, H: np.ndarray, max_iter: int = 50, early_stop: bool = True,
                 dtype=jnp.float32, impl: str = "xla", pallas_batch_tile: int = 128):
        self.H = np.asarray(H)
        self.m, self.n = self.H.shape
        self.max_iter = max_iter
        self.early_stop = early_stop
        self.graph = TannerGraph.from_H(self.H)
        self.dtype = dtype
        self._decode = jax.jit(self._make_xla_decoder())
        self._pallas_tile = pallas_batch_tile
        # fast-path policy lives in ONE place (ops/bp_pallas.resolve_bp_impl),
        # shared with sim.pipelines.make_ldpc_pipeline
        from ...ops.bp_pallas import resolve_bp_impl

        self._run_fn, self.impl, self._decode_pallas = resolve_bp_impl(
            self.graph, self._decode, max_iter, early_stop, dtype,
            impl=impl, batch_tile=pallas_batch_tile, jit_pallas=True,
            check_rule=self._check_rule, normalization=self.normalization,
            offset=self.offset, schedule=self._schedule,
            num_layers=self.num_layers)

    def _make_xla_decoder(self):
        return make_bp_decoder(self.graph, self.max_iter, self.early_stop,
                               self.dtype)

    def _run(self, llr):
        return self._run_fn(llr)

    def decode(self, llr, return_iterations: bool = False):
        """Decode ``[n]`` or ``[batch, n]`` LLRs to hard bits (full codeword).

        With ``return_iterations=True`` also returns per-frame iteration
        counts (reference ``decoder.py:124-131``).
        """
        llr = jnp.asarray(llr, self.dtype)
        squeeze = llr.ndim == 1
        bits, iters = self._run(jnp.atleast_2d(llr))
        if squeeze:
            bits, iters = bits[0], iters[0]
        return (bits, iters) if return_iterations else bits

    def __repr__(self) -> str:
        return f"BPDecoder(n={self.n}, m={self.m}, max_iter={self.max_iter})"
