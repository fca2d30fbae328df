"""Polar code construction (host-side NumPy).

Code construction is a one-time, host-side computation whose output (a frozen
mask) is a *static* input to the device kernels — mirroring the reference's
structure where frozen sets come from a construction step and are handed to
encoder/decoder ctors (reference ``src/polar/construction.py``, and the
harness's oracle-construction path at ``benchmarks/ber_simulation.py:145-152``).

Index convention (verified against the reference decoder's trellis,
``src/polar/decoder.py:73-115``, and empirically by BER at N≥512): trellis
stage *s* selects f/g by bit *s* of the u-index, so the *first* channel
split lives at the LSB.  The recursions here therefore concatenate children
block-wise (old index in the low bits) — see :func:`bhattacharyya_bounds`
for why this deliberately deviates from the reference's interleaved order.
"""

from __future__ import annotations

import numpy as np
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# bit-reversal utilities (reference src/polar/utils.py:11-45)
# ---------------------------------------------------------------------------

def bit_reverse(x: int, num_bits: int) -> int:
    """Reverse the ``num_bits``-bit binary representation of ``x``."""
    out = 0
    for _ in range(num_bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


def bit_reverse_permutation(N: int) -> np.ndarray:
    """Vector of bit-reversed indices: ``perm[i] = bit_reverse(i, log2 N)``."""
    n = int(np.log2(N))
    idx = np.arange(N, dtype=np.int64)
    out = np.zeros(N, dtype=np.int64)
    for b in range(n):
        out |= ((idx >> b) & 1) << (n - 1 - b)
    return out


def bit_reverse_array(arr: np.ndarray, num_bits: int) -> np.ndarray:
    """Permute: element ``i`` moves to position ``bit_reverse(i)``
    (reference ``utils.py:29-45``)."""
    perm = bit_reverse_permutation(1 << num_bits)
    out = np.zeros_like(arr)
    out[perm] = arr
    return out


# ---------------------------------------------------------------------------
# reliability metrics
# ---------------------------------------------------------------------------

def bhattacharyya_bounds(N: int, snr_db: float) -> np.ndarray:
    """Bhattacharyya parameters Z for every bit channel.

    Base channel Z = exp(−SNR_lin); recursion Z → (2Z−Z², Z²)
    (reference ``construction.py:11-48``).

    Index convention: the natural-order butterfly/trellis (no bit-reversal,
    ``encoder.py`` / ``decoder.py`` semantics) applies the *first* channel
    split at the LSB of the u-index — stage s of the trellis selects f/g by
    bit s of the leaf (``decoder.py:87-94``).  The recursion must therefore
    place each new split at the LSB (children concatenated block-wise, the
    old index in the low bits).  The reference interleaves the other way
    (first split at MSB, ``construction.py:30-38``), which mismatches its
    own decoder — a latent bug it never hits because every real run takes
    frozen sets from the ``polarcodes`` oracle (SURVEY §1); fixed here.
    """
    n = int(np.log2(N))
    snr_linear = 10.0 ** (snr_db / 10.0)
    Z = np.array([np.exp(-snr_linear)], dtype=np.float64)
    for _ in range(n):
        bad = 2.0 * Z - Z * Z
        good = Z * Z
        Z = np.concatenate([bad, good])
    return Z


def gaussian_approximation(N: int, snr_db: float) -> np.ndarray:
    """Reference-compatible *heuristic* "Gaussian approximation".

    This reproduces the reference's crude update (×0.9 for the degraded
    child below saturation, ×2 capped at 100 for the upgraded child —
    ``construction.py:51-97``), kept for surface parity.  For a principled
    construction use :func:`dega_llr_means`.  Split-index convention fixed
    as in :func:`bhattacharyya_bounds` (new split at LSB).
    """
    n = int(np.log2(N))
    snr_linear = 10.0 ** (snr_db / 10.0)
    mu = np.array([2.0 * snr_linear], dtype=np.float64)
    for _ in range(n):
        bad = np.where(mu < 10.0, mu * 0.9, mu)
        good = np.minimum(2.0 * mu, 100.0)
        mu = np.concatenate([bad, good])
    return mu


def _phi(x: np.ndarray) -> np.ndarray:
    """Trifonov's two-piece approximation of the DE-GA φ function."""
    x = np.maximum(x, 1e-12)
    small = np.exp(-0.4527 * np.power(x, 0.859) + 0.0218)
    large = np.sqrt(np.pi / x) * np.exp(-x / 4.0) * (1.0 - 10.0 / (7.0 * x))
    return np.where(x < 10.0, small, np.maximum(large, 0.0))


def _phi_inv(y: np.ndarray) -> np.ndarray:
    """Numerical inverse of :func:`_phi` by bisection (φ is decreasing)."""
    y = np.clip(y, 1e-300, 1.0 - 1e-15)
    lo = np.full_like(y, 1e-12)
    hi = np.full_like(y, 1e4)
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        too_big = _phi(mid) > y  # φ(mid) > y  →  mid too small
        lo = np.where(too_big, mid, lo)
        hi = np.where(too_big, hi, mid)
    return 0.5 * (lo + hi)


def dega_llr_means(N: int, snr_db: float) -> np.ndarray:
    """Proper density-evolution Gaussian approximation (DE-GA) LLR means.

    An improvement over the reference's heuristic (it ships only the crude
    update above): μ → (φ⁻¹(1−(1−φ(μ))²), 2μ).  Larger mean ⇒ better channel.
    Split-index convention as in :func:`bhattacharyya_bounds` (new split at
    LSB, matching the natural-order trellis).
    """
    n = int(np.log2(N))
    snr_linear = 10.0 ** (snr_db / 10.0)
    mu = np.array([2.0 * snr_linear], dtype=np.float64)
    for _ in range(n):
        phi_mu = _phi(mu)
        bad = _phi_inv(1.0 - (1.0 - phi_mu) ** 2)
        good = 2.0 * mu
        mu = np.concatenate([bad, good])
    return mu


# ---------------------------------------------------------------------------
# frozen set selection
# ---------------------------------------------------------------------------

def genie_leaf_llrs(llr):
    """Genie-aided SC decision LLRs for the all-zero codeword, every leaf.

    With all prior bits known (= 0 for the all-zero codeword), leaf *l*'s
    decision LLR is a deterministic function of the channel LLRs: the f/g
    recursion with all partial sums zero (g degenerates to a sum).  Returns
    ``[..., N]`` indexed by u-position.  Device-side and jit-friendly —
    the workhorse of Monte-Carlo construction.
    """
    import jax.numpy as jnp

    def node(alpha, off, step, size):
        """Returns (u_indices, leaf_llrs [..., size]) in emission order."""
        if size == 1:
            return [off], alpha
        e, o = alpha[..., 0::2], alpha[..., 1::2]
        f = jnp.sign(e) * jnp.sign(o) * jnp.minimum(jnp.abs(e), jnp.abs(o))
        idx_e, llr_e = node(f, off, 2 * step, size // 2)
        idx_o, llr_o = node(o + e, off + step, 2 * step, size // 2)
        return idx_e + idx_o, jnp.concatenate([llr_e, llr_o], axis=-1)

    llr = jnp.asarray(llr)
    N = llr.shape[-1]
    idx, leaves = node(llr, 0, 1, N)
    inv = np.argsort(np.asarray(idx, np.int64))
    return leaves[..., inv]


def monte_carlo_reliabilities(N: int, snr_db: float, num_frames: int = 10000,
                              seed: int = 0, batch: int = 1024) -> np.ndarray:
    """Per-bit-channel error probabilities by Monte-Carlo (genie-aided SC).

    The reference *advertises* ``monte_carlo`` construction in its config
    (``config/polar_config.yaml``) but never implements it; this is the
    real thing, batched on device: sample AWGN LLRs for the all-zero
    codeword, compute every leaf's genie decision LLR in one pass, and
    count sign errors per u-position.  Lower = better channel.
    """
    import jax
    import jax.numpy as jnp

    from ...channels.awgn import awgn_noise_std

    std = awgn_noise_std(snr_db)

    @jax.jit
    def chunk_errors(key):
        noise = jax.random.normal(key, (batch, N))
        llr = 2.0 * (1.0 + std * noise) / (std * std)  # all-zero cw → s=+1
        leaves = genie_leaf_llrs(llr)
        return jnp.sum(leaves < 0, axis=0, dtype=jnp.int32)

    errors = np.zeros(N, np.int64)
    frames = 0
    import jax.random as jrandom

    root = jrandom.PRNGKey(seed)
    i = 0
    while frames < num_frames:
        errors += np.asarray(chunk_errors(jrandom.fold_in(root, i)))
        frames += batch
        i += 1
    return errors / frames


def generate_frozen_bits(
    N: int, K: int, channel_param: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Default frozen/info split (reference ``utils.py:48-83``).

    Without channel parameters, uses the reference's bit-reversal heuristic:
    sort indices by bit-reversed value and take the top-K as info bits.  With
    ``channel_param`` (smaller = better), takes the best K as info bits.
    """
    if channel_param is None:
        brev = bit_reverse_permutation(N)
        order = np.argsort(brev)
        info = order[-K:]
        frozen = order[:-K]
    else:
        order = np.argsort(channel_param)
        info = order[:K]
        frozen = order[K:]
    return np.sort(frozen), np.sort(info)


def construct_polar_code(
    N: int, K: int, method: str = "bhattacharyya", snr_db: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Pick frozen/info positions (reference ``construction.py:100-140``).

    Methods: ``bhattacharyya`` (Z ascending → best K), ``gaussian_approximation``
    (reference heuristic, μ descending), ``dega`` (proper DE-GA, new),
    ``monte_carlo`` (genie-aided simulation, advertised-but-missing in the
    reference config), and ``default`` (bit-reversal heuristic).
    Returns ``(frozen_positions, info_positions)``, both sorted.
    """
    if method == "bhattacharyya":
        z = bhattacharyya_bounds(N, snr_db)
        order = np.argsort(z)
        info, frozen = order[:K], order[K:]
    elif method == "gaussian_approximation":
        mu = gaussian_approximation(N, snr_db)
        order = np.argsort(mu)[::-1]
        info, frozen = order[:K], order[K:]
    elif method == "dega":
        mu = dega_llr_means(N, snr_db)
        order = np.argsort(-mu, kind="stable")
        info, frozen = order[:K], order[K:]
    elif method == "monte_carlo":
        pe = monte_carlo_reliabilities(N, snr_db)
        order = np.argsort(pe, kind="stable")  # lowest error prob first
        info, frozen = order[:K], order[K:]
    elif method == "default":
        return generate_frozen_bits(N, K)
    else:
        raise ValueError(f"unknown construction method: {method!r}")
    return np.sort(frozen), np.sort(info)


def calculate_channel_capacities(N: int, snr_db: float) -> np.ndarray:
    """Per-bit-channel capacity estimate C = 1 − H₂((1−Z)/2)
    (reference ``construction.py:143-174``)."""
    z = bhattacharyya_bounds(N, snr_db)
    cap = np.zeros(N)
    lo = z < 1e-10
    hi = z > 1.0 - 1e-10
    mid = ~(lo | hi)
    p = (1.0 - z[mid]) / 2.0
    valid = (p > 0) & (p < 1)
    h = np.zeros_like(p)
    h[valid] = -p[valid] * np.log2(p[valid]) - (1 - p[valid]) * np.log2(1 - p[valid])
    cap[mid] = np.where(valid, 1.0 - h, 0.0)
    cap[lo] = 1.0
    cap[hi] = 0.0
    return cap


def frozen_mask_from_positions(N: int, frozen_positions: np.ndarray) -> np.ndarray:
    """Boolean mask [N], True at frozen positions."""
    mask = np.zeros(N, dtype=bool)
    mask[np.asarray(frozen_positions, dtype=np.int64)] = True
    return mask
