"""Chunk-scan SCL decoder — compile-light fast path for large N / batch.

The unrolled decoder (``fastscl.py``) emits O(N) distinct XLA ops; its
compile time grows with both N and batch (measured ~101 s for SCL-8 N=1024
at batch 512 on v5e, ~8 min for N=4096 SCL-32), which caps the usable batch
size and with it the throughput (the decode is op-overhead-bound, not
FLOP-bound).  This module restructures the same algorithm so XLA compiles a
*constant-size* program regardless of N:

* **bit-reversed storage**: the channel LLRs are permuted once so every
  even/odd deinterleave of the natural-order recursion becomes a contiguous
  half-split, and the leaf visit order in storage equals the reference's
  bit-reversed decode order (``src/polar/decoder.py:54-55``);
* **chunk scan**: the code tree is cut at subtree size ``S``; a
  ``lax.scan`` walks the ``C = N/S`` chunks in DFS order.  One *uniform*
  chunk body (frozen flags as traced data, per-leaf ``lax.cond``) decodes
  each size-``S`` subtree — compiled once, executed C times;
* **semi-parallel stage stack**: between chunks, alphas/left-betas for the
  outer levels 1..t (t = log2 C) live in fixed-shape per-level arrays; the
  varying descend/ascend work per chunk (which levels recompute, f vs g,
  which combine) is driven by host-precomputed static schedules through
  ``lax.cond`` — classic semi-parallel SC architecture, list-extended;
* **lazy list permutations**: pruning at info leaves permutes the list axis
  of all live state.  Each outer level keeps a *pending* one-hot
  permutation ``[B, L, L]`` (composed with the chunk's relative permutation
  after every chunk, cost O(L³) each); the stored alpha/beta is refreshed
  on the fly only when a schedule event actually reads it, and pendings
  reset to identity on writes.  This preserves the unrolled decoder's
  O(L²·N·log) one-hot gather traffic instead of the O(L²·N·C) an eager
  whole-stack permute would cost.

Outputs are bit-exact with the reference semantics twin
(``parity/polar_np.scl_decode_np``) and ``scl.make_scl_decoder``: identical
leaf visit order, identical candidate ordering and stable tie-breaking,
identical sequential metric accumulation at frozen leaves
(``src/polar/decoder.py:264-281``), identical −inf phantom-path handling.

Reference semantics: ``/root/reference/src/polar/decoder.py:176-444``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from .construction import bit_reverse_permutation
from .encoder import polar_transform
from .fastscl import _d0_d1, _sel_metrics, _stable_topk_onehot
from .trellis import f_minsum

_NEG_INF = -jnp.inf


def _apply_perm(P, x):
    """Apply one-hot selection ``P [B, L, J]`` along the list axis of
    ``x [B, J, ...]`` (exact for one-hot P and finite x)."""
    xf = x.reshape(x.shape[0], x.shape[1], -1)
    out = jnp.einsum("blj,bjm->blm", P, xf.astype(P.dtype),
                     preferred_element_type=P.dtype)
    return out.reshape(x.shape[0], P.shape[1], *x.shape[2:])


def _apply_perm_bits(P, bits):
    return _apply_perm(P, bits).astype(jnp.int8)


def _compose(A, B):
    """Composition of selection maps: apply B first, then A (⇒ A @ B)."""
    return jnp.einsum("blj,bjk->blk", A, B, preferred_element_type=A.dtype)


def _ctz(x: int) -> int:
    return (x & -x).bit_length() - 1


def _make_chunk_body(S: int, Lsz: int, dtype):
    """Uniform size-S subtree decoder.

    ``body(alpha [B,L,S], pm [B,L], flags [S] traced bool) →
    (beta [B,L,S] int8, pm [B,L], R [B,L,L] one-hot)``; ``R`` maps
    post-chunk list slots to pre-chunk slots (``after[l] = before[R[l]]``).
    Frozen structure arrives as *data*, so one compiled body serves every
    chunk of every code — per-leaf ``lax.cond`` picks the frozen
    (metric-update only, reference ``decoder.py:264-281``) or info
    (branch + stable top-L prune, ``decoder.py:283-339``) path at runtime.
    """

    def node(alpha, pm, off: int, size: int, flags):
        batch = alpha.shape[0]
        eye = jnp.broadcast_to(jnp.eye(Lsz, dtype=dtype), (batch, Lsz, Lsz))
        if size == 1:
            a = alpha[..., 0]
            d0, d1 = _d0_d1(a)

            def frozen_case(pm):
                bits = jnp.zeros(a.shape, jnp.int8)
                return bits[..., None], pm + d0, eye

            def info_case(pm):
                cand = jnp.concatenate([pm + d0, pm + d1], axis=-1)  # [B, 2L]
                S2 = _stable_topk_onehot(cand, Lsz, dtype)
                pm2 = _sel_metrics(S2, cand)
                bits = jnp.sum(S2[..., Lsz:], axis=-1).astype(jnp.int8)
                R = S2[..., :Lsz] + S2[..., Lsz:]
                return bits[..., None], pm2, R

            return lax.cond(flags[off], frozen_case, info_case, pm)

        half = size // 2
        first, second = alpha[..., :half], alpha[..., half:]
        beta_l, pm, R_l = node(f_minsum(first, second), pm, off, half, flags)
        alpha = _apply_perm(R_l, alpha)
        first, second = alpha[..., :half], alpha[..., half:]
        sgn = 1.0 - 2.0 * beta_l.astype(alpha.dtype)
        beta_r, pm, R_r = node(second + sgn * first, pm, off + half, half, flags)
        beta_l = _apply_perm_bits(R_r, beta_l)
        beta = jnp.concatenate([beta_l ^ beta_r, beta_r], axis=-1)
        return beta, pm, _compose(R_r, R_l)

    def body(alpha, pm, flags):
        return node(alpha, pm, 0, S, flags)

    return body


def make_scl_decoder_scan(N: int, frozen_mask: np.ndarray, list_size: int,
                          chunk: int = 64, dtype=jnp.float32):
    """Build a jittable chunk-scan SCL decoder.

    Same contract as ``scl.make_scl_decoder``: ``decode(llr [B, N]) →
    (u [B, L, N] int8 natural order, metrics [B, L])``.

    ``chunk`` is the subtree size S cut by the scan (power of two ≤ N);
    compile time is O(S + log(N/S)), independent of N and batch.
    """
    frozen_mask = np.asarray(frozen_mask, bool)
    assert frozen_mask.shape == (N,)
    S = min(chunk, N)
    assert S & (S - 1) == 0 and N % S == 0
    C = N // S
    t = int(np.log2(C))
    Lsz = list_size
    rev = np.asarray(bit_reverse_permutation(N))
    chunk_flags_np = frozen_mask[rev].reshape(C, S)
    body = _make_chunk_body(S, Lsz, dtype)
    rev_j = jnp.asarray(rev, jnp.int32)

    if C == 1:
        flags_const = jnp.asarray(chunk_flags_np[0])

        def decode_single(llr):
            llr = jnp.asarray(llr, dtype)
            assert llr.ndim == 2, "SCL decode expects [batch, N]"
            batch = llr.shape[0]
            alpha = jnp.broadcast_to(llr[:, rev_j][:, None, :], (batch, Lsz, N))
            pm = jnp.full((batch, Lsz), _NEG_INF, dtype).at[:, 0].set(0.0)
            beta, pm, _ = body(alpha, pm, flags_const)
            return polar_transform(beta[..., rev_j]), pm

        return decode_single

    # -- host-precomputed per-chunk schedules (levels indexed 1..t) ----------
    # upd[c, l]: recompute level-l alpha this chunk (deepest-common-ancestor
    #            rule: levels t-ctz(c)..t change between consecutive chunks)
    # dirr[c, l]: chunk path bit at level l — False → left child (f update),
    #            True → right child (g update, consumes the stored left beta)
    # asc[c, l]: combine the finished subtree's beta with the stored left
    #            beta at level l while ascending (trailing-ones rule)
    # store[c, l]: park the ascended beta as the new left beta at level l
    upd = np.zeros((C, t + 1), bool)
    dirr = np.zeros((C, t + 1), bool)
    asc = np.zeros((C, t + 1), bool)
    store = np.zeros((C, t + 1), bool)
    for c in range(C):
        lo = 1 if c == 0 else t - _ctz(c)
        upd[c, lo:t + 1] = True
        for l in range(1, t + 1):
            dirr[c, l] = bool((c >> (t - l)) & 1)
        k = _ctz(c + 1)
        asc[c, t - k + 1:t + 1] = True
        if c != C - 1:
            store[c, t - k] = True
    is_last = np.zeros((C,), bool)
    is_last[C - 1] = True
    sizes = [N >> l for l in range(t + 1)]  # alpha/beta width per level

    xs = {
        "upd": jnp.asarray(upd), "dirr": jnp.asarray(dirr),
        "asc": jnp.asarray(asc), "store": jnp.asarray(store),
        "last": jnp.asarray(is_last), "flags": jnp.asarray(chunk_flags_np),
    }

    def decode(llr):
        llr = jnp.asarray(llr, dtype)
        assert llr.ndim == 2, "SCL decode expects [batch, N]"
        batch = llr.shape[0]
        llr_b = llr[:, rev_j]  # bit-reversed storage (halves == even/odd)
        eye = jnp.broadcast_to(jnp.eye(Lsz, dtype=dtype), (batch, Lsz, Lsz))
        carry = dict(
            alpha=tuple(jnp.zeros((batch, Lsz, sizes[l]), dtype)
                        for l in range(1, t + 1)),
            pend_a=tuple(eye for _ in range(t)),
            beta=tuple(jnp.zeros((batch, Lsz, sizes[l]), jnp.int8)
                       for l in range(1, t + 1)),
            pend_b=tuple(eye for _ in range(t)),
            pm=jnp.full((batch, Lsz), _NEG_INF, dtype).at[:, 0].set(0.0),
            root=jnp.zeros((batch, Lsz, N), jnp.int8),
        )

        def chunk_step(carry, x):
            alpha = list(carry["alpha"])
            pend_a = list(carry["pend_a"])
            beta = list(carry["beta"])
            pend_b = list(carry["pend_b"])
            pm = carry["pm"]

            # ---- descend: refresh-on-read, masked f/g level updates -------
            for l in range(1, t + 1):
                i = l - 1
                M = sizes[l]

                def do_update(alpha_l, _l=l, _i=i, _M=M):
                    if _l == 1:  # parent = channel LLR: path-invariant
                        parent = llr_b[:, None, :]
                    else:
                        parent = _apply_perm(pend_a[_i - 1], alpha[_i - 1])
                    first, second = parent[..., :_M], parent[..., _M:]

                    def g_update(_):
                        left_bits = _apply_perm(pend_b[_i], beta[_i])  # 0/1 f32
                        return second + (1.0 - 2.0 * left_bits) * first

                    def f_update(_):
                        return jnp.broadcast_to(f_minsum(first, second),
                                                (batch, Lsz, _M))

                    return lax.cond(x["dirr"][_l], g_update, f_update, None)

                alpha[i] = lax.cond(x["upd"][l], do_update,
                                    lambda a: a, alpha[i])
                pend_a[i] = jnp.where(x["upd"][l], eye, pend_a[i])

            # ---- chunk body: decode the size-S subtree --------------------
            beta_c, pm, R = body(alpha[t - 1], pm, x["flags"])

            # ---- compose the chunk's relative permutation into pendings ---
            for i in range(t):
                pend_a[i] = _compose(R, pend_a[i])
                pend_b[i] = _compose(R, pend_b[i])

            # ---- ascend: combine completed right subtrees, park left ------
            cur = beta_c
            for l in range(t, 0, -1):
                i = l - 1

                def combine(cur, _i=i):
                    left = _apply_perm_bits(pend_b[_i], beta[_i])
                    return jnp.concatenate([left ^ cur, cur], axis=-1)

                def no_combine(cur):
                    return jnp.concatenate([cur, cur], axis=-1)  # dead value

                beta[i] = jnp.where(x["store"][l], cur, beta[i])
                pend_b[i] = jnp.where(x["store"][l], eye, pend_b[i])
                cur = lax.cond(x["asc"][l], combine, no_combine, cur)

            root = jnp.where(x["last"], cur, carry["root"])
            return dict(alpha=tuple(alpha), pend_a=tuple(pend_a),
                        beta=tuple(beta), pend_b=tuple(pend_b),
                        pm=pm, root=root), None

        carry, _ = lax.scan(chunk_step, carry, xs)
        # root beta is the re-encoded codeword in bit-reversed storage;
        # un-permute, then u = β·G_N (the transform is an involution)
        return polar_transform(carry["root"][..., rev_j]), carry["pm"]

    return decode
