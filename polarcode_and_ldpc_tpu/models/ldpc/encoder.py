"""LDPC encoder: systematic GF(2) encoding on the MXU.

Reference semantics (``src/ldpc/encoder.py:12-211``): prefer ``c = m·G mod 2``
with a (k,n) generator (accepting pyldpc-style (n,k) by transposition,
``encoder.py:54-63``); else derive G = [I | Pᵀ] from H; else fall back to
directly solving H₂·pᵀ = H₁·mᵀ over GF(2) (``encoder.py:97-187``).

TPU re-design: every path reduces to one static GF(2) matrix — even the
"direct solve" path, whose Gaussian elimination depends only on H, so a
solution operator S with p = S·(H₁·m) is precomputed host-side once and the
device encode is a single int8→int32 matmul + mod 2, batched over frames.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .matrix import encodable_form, generate_ldpc_matrix


def gf2_solve(A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Solve A·x = b over GF(2) by Gaussian elimination + back-substitution
    (semantics of reference ``encoder.py:133-187``; free variables → 0)."""
    A = (np.asarray(A) % 2).astype(np.uint8)
    b = (np.asarray(b) % 2).astype(np.uint8)
    m, n = A.shape
    aug = np.hstack([A, b.reshape(-1, 1)])
    pivot_row = 0
    pivot_cols = []
    for col in range(n):
        if pivot_row >= m:
            break
        hit = np.nonzero(aug[pivot_row:, col])[0]
        if hit.size == 0:
            continue
        pr = pivot_row + hit[0]
        if pr != pivot_row:
            aug[[pivot_row, pr]] = aug[[pr, pivot_row]]
        elim = (aug[:, col] == 1) & (np.arange(m) != pivot_row)
        aug[elim] ^= aug[pivot_row]
        pivot_cols.append(col)
        pivot_row += 1
    x = np.zeros(n, dtype=np.int64)
    for r, col in enumerate(pivot_cols):
        # after full elimination each pivot row determines x[col] directly
        x[col] = aug[r, -1] ^ (int(np.sum(aug[r, col + 1:n] & x[col + 1:n])) & 1)
    return x


class LDPCEncoder:
    """Batched LDPC encoder (reference API: ``src/ldpc/encoder.py:12-211``)."""

    def __init__(self, n: int, k: int, H: Optional[np.ndarray] = None,
                 G: Optional[np.ndarray] = None, dv: int = 3, dc: int = 6,
                 seed: Optional[int] = None, method: str = "regular"):
        assert n > k > 0, "invalid code parameters"
        self.n = n
        self.k = k
        if H is None:
            self.m = n - k
            # default "regular" (balanced rows): measured statistical parity
            # with the reference's committed BP curves, which were produced
            # with pyldpc's balanced H — its own mackay (rows 0..13 at n=504)
            # is ~2-4x worse in BER and is kept for surface parity only
            self.H = generate_ldpc_matrix(n, k, method=method, dv=dv, dc=dc, seed=seed)
        else:
            self.H = np.asarray(H)
            m_actual, n_actual = self.H.shape
            assert n_actual == n, f"H matrix must have {n} columns"
            self.m = m_actual
            if n - m_actual != k:
                print(f"Warning: H implies k={n - m_actual}, but k={k} was provided")

        self.use_direct_solving = False
        self.info_positions = np.arange(k, dtype=np.int64)  # systematic default
        if G is not None:
            if G.shape == (n, k):
                self.G = np.asarray(G).T % 2
            elif G.shape == (k, n):
                self.G = np.asarray(G) % 2
            else:
                raise ValueError(f"G shape {G.shape} doesn't match (n,k) or (k,n)")
            self.P = None
        else:
            # one right-side-pivot elimination covers both cases: when the
            # last m columns are nonsingular its result IS the systematic
            # G = [I | Pᵀ] (info = 0..k−1); otherwise it yields a general
            # information set — the reference's per-frame direct solve
            # silently fails there (encoder.py:97-131)
            self.P = None
            self.G, info = encodable_form(self.H, k)
            if self.G is None:
                print("Warning: H admits no rank-compatible information set; "
                      "encoding will return zero codewords")
            else:
                self.info_positions = np.asarray(info, dtype=np.int64)
                systematic = bool((self.info_positions == np.arange(k)).all())
                if systematic:
                    self.P = self.G[:, k:].T  # G = [I | Pᵀ] ⇒ recover P
                self.use_direct_solving = not systematic  # reference flag name

        self._G_dev = jnp.asarray(self.G, jnp.int32) if self.G is not None else None
        self._encode_jit = jax.jit(self._encode_impl)

    def _encode_impl(self, message):
        msg = jnp.asarray(message, jnp.int32)
        if self._G_dev is not None:
            cw = jnp.dot(msg, self._G_dev, preferred_element_type=jnp.int32) % 2
        else:
            cw = jnp.zeros((*msg.shape[:-1], self.n), jnp.int32)
        return cw.astype(jnp.int8)

    def extract_message(self, codeword):
        """Recover the k message bits from a (decoded) codeword.

        For systematic codes this is ``codeword[..., :k]`` (what the reference
        harness does at e.g. ``benchmarks/ber_simulation.py:268``); for the
        general information-set fallback it gathers ``info_positions``.
        """
        idx = jnp.asarray(self.info_positions, jnp.int32)
        return jnp.asarray(codeword)[..., idx]

    def encode(self, message):
        """Encode ``[k]`` or ``[..., k]`` messages → ``[..., n]`` codewords
        (reference ``encoder.py:76-95``)."""
        assert np.shape(message)[-1] == self.k, f"message length must be {self.k}"
        return self._encode_jit(message)

    def verify_codeword(self, codeword) -> bool:
        """H·cᵀ ≡ 0 check (reference ``encoder.py:189-200``); batched input
        returns a boolean array."""
        syn = (np.asarray(codeword) @ self.H.T) % 2
        ok = np.all(syn == 0, axis=-1)
        return bool(ok) if np.ndim(ok) == 0 else ok

    def get_code_rate(self) -> float:
        return self.k / self.n

    def get_parity_check_matrix(self) -> np.ndarray:
        return self.H.copy()

    def __repr__(self) -> str:
        return f"LDPCEncoder(n={self.n}, k={self.k}, rate={self.get_code_rate():.3f})"
