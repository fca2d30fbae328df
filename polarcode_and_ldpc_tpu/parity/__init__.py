"""NumPy "twins" of the reference implementations.

These are fresh, self-contained NumPy implementations that reproduce the
reference's *semantics* (update rules, orderings, tie-breaking) exactly —
they serve as the bit-exact oracle for the device kernels, replacing the
reference's third-party-library differential testing
(``benchmarks/ber_simulation.py:87-118``), since identical noise can be fed
to both sides.  Float64 throughout, single frame at a time, deliberately
simple and slow.
"""

from . import channel_np, ldpc_np, polar_np

__all__ = ["polar_np", "ldpc_np", "channel_np"]
