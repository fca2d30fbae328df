"""Optional third-party oracle wrappers (reference ``src/lib_wrappers/``).

The reference validates its implementations against ``polarcodes`` and
``pyldpc`` and — crucially — uses them as the production code-construction
service (frozen sets, H/G matrices; SURVEY §1 "key structural fact").  Both
libraries are optional here: when absent (this framework ships its own
construction in ``models/*/construction``/``matrix``), every entry point
degrades gracefully, exactly like the reference's ImportError guards
(``polar_wrapper.py:11-15``, ``ldpc_wrapper.py:11-15``).
"""

from __future__ import annotations


def oracle_available(which: str) -> bool:
    """True when the third-party library backing ``which`` is importable."""
    try:
        if which == "polar":
            import polarcodes  # noqa: F401
        elif which == "ldpc":
            import pyldpc  # noqa: F401
        else:
            return False
        return True
    except ImportError:
        return False


def oracle_polar_frozen_set(N: int, K: int, design_snr_db: float = 2.0):
    """Frozen positions from the ``polarcodes`` oracle: the library when
    importable, else the pure-NumPy reimplementation of its published
    construction algorithm (``constructions_np.polar_construct_np``).

    Returns ``(frozen_positions sorted, backend_str)``."""
    if oracle_available("polar"):
        from .polar_oracle import PolarLibWrapper

        return (PolarLibWrapper(N, K, design_snr_db).get_frozen_positions(),
                "polarcodes")
    from .constructions_np import polar_construct_np

    return polar_construct_np(N, K, design_snr_db)[0], "numpy-reimpl"


def oracle_ldpc_matrices(n: int, dv: int = 3, dc: int = 6, seed: int = 42):
    """(H, G, backend) from the ``pyldpc`` oracle: the library when
    importable, else the pure-NumPy reimplementation of its published
    systematic ``make_ldpc`` (``constructions_np.make_ldpc_np``).  ``G``
    is in pyldpc's tall ``(n, k_actual)`` orientation with the possible
    ``k_actual ≠ n − m`` shrink the reference propagates
    (``ldpc_wrapper.py:49-60``)."""
    if oracle_available("ldpc"):
        from .ldpc_oracle import LDPCLibWrapper

        w = LDPCLibWrapper(n, dv, dc, seed)
        return w.H, w.G, "pyldpc"
    from .constructions_np import make_ldpc_np

    H, G = make_ldpc_np(n, dv, dc, seed=seed)
    return H, G, "numpy-reimpl"


__all__ = ["oracle_available", "oracle_polar_frozen_set",
           "oracle_ldpc_matrices"]
