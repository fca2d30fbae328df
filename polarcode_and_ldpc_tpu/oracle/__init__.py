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


__all__ = ["oracle_available"]
