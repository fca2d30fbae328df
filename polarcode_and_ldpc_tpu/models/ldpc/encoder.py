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

from .matrix import create_systematic_generator, generate_ldpc_matrix


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


def _direct_solve_operator(H: np.ndarray, k: int) -> Optional[np.ndarray]:
    """Precompute M with parity = (m · Mᵀ) mod 2 for the direct-solve path.

    The reference solves H₂·pᵀ = H₁·mᵀ per frame (``encoder.py:97-131``);
    since the solve is linear in the RHS, p = S·H₁·m for a fixed S, so
    M = S·H₁ is a static [n−k, k] matrix.  Returns None if H₂ is unusable.
    """
    H = np.asarray(H) % 2
    m_rows, n = H.shape
    H1, H2 = H[:, :k], H[:, k:]
    p_len = n - k
    S_H1 = np.zeros((p_len, k), dtype=np.int64)
    for j in range(k):
        b = H1[:, j] % 2
        S_H1[:, j] = gf2_solve(H2, b)
    # validate: H1 + H2·M ≡ 0 column-wise
    if np.any((H1 + H2 @ S_H1) % 2):
        return None
    return S_H1


class LDPCEncoder:
    """Batched LDPC encoder (reference API: ``src/ldpc/encoder.py:12-211``)."""

    def __init__(self, n: int, k: int, H: Optional[np.ndarray] = None,
                 G: Optional[np.ndarray] = None, dv: int = 3, dc: int = 6,
                 seed: Optional[int] = None):
        assert n > k > 0, "invalid code parameters"
        self.n = n
        self.k = k
        if H is None:
            self.m = n - k
            self.H = generate_ldpc_matrix(n, k, method="mackay", dv=dv, dc=dc, seed=seed)
        else:
            self.H = np.asarray(H)
            m_actual, n_actual = self.H.shape
            assert n_actual == n, f"H matrix must have {n} columns"
            self.m = m_actual
            if n - m_actual != k:
                print(f"Warning: H implies k={n - m_actual}, but k={k} was provided")

        self.use_direct_solving = False
        self._parity_op = None  # [n-k, k] for direct-solve path
        if G is not None:
            if G.shape == (n, k):
                self.G = np.asarray(G).T % 2
            elif G.shape == (k, n):
                self.G = np.asarray(G) % 2
            else:
                raise ValueError(f"G shape {G.shape} doesn't match (n,k) or (k,n)")
            self.P = None
        else:
            self.G, self.P = create_systematic_generator(self.H)
            if self.G is None:
                print("Warning: could not create systematic generator matrix, "
                      "using direct solving")
                self.use_direct_solving = True
                self._parity_op = _direct_solve_operator(self.H, k)
                if self._parity_op is None:
                    print("Warning: direct-solve operator invalid; "
                          "encoding will return zero codewords")

        if self.G is not None:
            self._G_dev = jnp.asarray(self.G, jnp.int32)
        elif self._parity_op is not None:
            self._M_dev = jnp.asarray(self._parity_op.T, jnp.int32)  # [k, n-k]
        self._encode_jit = jax.jit(self._encode_impl)

    def _encode_impl(self, message):
        msg = jnp.asarray(message, jnp.int32)
        if self.G is not None:
            cw = jnp.dot(msg, self._G_dev, preferred_element_type=jnp.int32) % 2
        elif self._parity_op is not None:
            parity = jnp.dot(msg, self._M_dev, preferred_element_type=jnp.int32) % 2
            cw = jnp.concatenate([msg, parity], axis=-1)
        else:
            cw = jnp.zeros((*msg.shape[:-1], self.n), jnp.int32)
        return cw.astype(jnp.int8)

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
