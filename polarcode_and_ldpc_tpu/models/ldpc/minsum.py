"""Min-Sum LDPC decoders: plain/normalized (NMS) and offset (OMS).

Reference semantics (``src/ldpc/decoder.py:208-355``): check update is
sign-product × leave-one-out min-magnitude × normalization α (``:257-287``;
note ``np.sign(0) = 0`` zero-propagation is preserved), variable update and
early stop identical to BP.  The offset variant (β) is *configured* in the
reference (``config/ldpc_config.yaml`` ms_params.offset) but never
implemented — provided here: magnitude ``max(min − β, 0)``.

``NMSDecoder`` / ``OMSDecoder`` are named in the reference's
``ARCHITECTURE.md:59-60`` but do not exist there; both are supplied.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bp import BPDecoder, make_bp_decoder, _exclusive_products
from .graph import TannerGraph


def _exclusive_min(x, mask):
    """Leave-one-out minimum along the last axis (masked slots → +inf)."""
    big = jnp.asarray(jnp.inf, x.dtype)
    x = jnp.where(mask, x, big)
    left = jax.lax.associative_scan(jnp.minimum, x, axis=-1)
    right = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(x, -1), axis=-1), -1)
    inf = jnp.full_like(x[..., :1], jnp.inf)
    excl_left = jnp.concatenate([inf, left[..., :-1]], axis=-1)
    excl_right = jnp.concatenate([right[..., 1:], inf], axis=-1)
    return jnp.minimum(excl_left, excl_right)


def ms_check_update(v2c_checkmajor, mask, normalization: float = 1.0,
                    offset: float = 0.0, dtype=jnp.float32):
    """Min-sum check-node update (reference ``decoder.py:257-287``)."""
    signs = jnp.sign(v2c_checkmajor)  # sign(0) = 0, as in the reference
    sign_prod = _exclusive_products(signs, mask)
    mags = _exclusive_min(jnp.abs(v2c_checkmajor), mask)
    if offset:
        mags = jnp.maximum(mags - offset, 0.0)
    out = sign_prod * mags * normalization
    # a degree-1 (or fully padded) row yields inf·0 → NaN; treat as 0
    return jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0).astype(dtype)


def make_ms_decoder(graph: TannerGraph, max_iter: int = 50,
                    normalization: float = 1.0, offset: float = 0.0,
                    early_stop: bool = True, dtype=jnp.float32):
    check = lambda msgs, mask: ms_check_update(msgs, mask, normalization, offset, dtype)
    return make_bp_decoder(graph, max_iter, early_stop, dtype, check_update=check)


class MSDecoder(BPDecoder):
    """Batched Min-Sum decoder (reference API:
    ``src/ldpc/decoder.py:208-355``), with optional offset.

    Shares the resolve/run/decode machinery with ``BPDecoder`` (only the
    check rule differs).  ``impl``: ``"xla"`` (portable default),
    ``"pallas"`` (the fused TPU kernel with the min-sum check rule —
    bit-identical), or ``"auto"``.
    """

    _check_rule = "ms"

    def __init__(self, H: np.ndarray, max_iter: int = 50,
                 normalization: float = 1.0, offset: float = 0.0,
                 early_stop: bool = True, dtype=jnp.float32,
                 impl: str = "xla", pallas_batch_tile: int = 128):
        self.normalization = normalization
        self.offset = offset
        super().__init__(H, max_iter, early_stop, dtype, impl,
                         pallas_batch_tile)

    def _make_xla_decoder(self):
        return make_ms_decoder(self.graph, self.max_iter, self.normalization,
                               self.offset, self.early_stop, self.dtype)

    def __repr__(self) -> str:
        return (f"MSDecoder(n={self.n}, m={self.m}, max_iter={self.max_iter}, "
                f"norm={self.normalization}, offset={self.offset})")


class NMSDecoder(MSDecoder):
    """Normalized Min-Sum (α-scaled)."""

    def __init__(self, H, max_iter: int = 50, normalization: float = 0.75,
                 early_stop: bool = True, dtype=jnp.float32,
                 impl: str = "xla", pallas_batch_tile: int = 128):
        super().__init__(H, max_iter, normalization, 0.0, early_stop, dtype,
                         impl, pallas_batch_tile)


class OMSDecoder(MSDecoder):
    """Offset Min-Sum (β-offset)."""

    def __init__(self, H, max_iter: int = 50, offset: float = 0.5,
                 early_stop: bool = True, dtype=jnp.float32,
                 impl: str = "xla", pallas_batch_tile: int = 128):
        super().__init__(H, max_iter, 1.0, offset, early_stop, dtype,
                         impl, pallas_batch_tile)
