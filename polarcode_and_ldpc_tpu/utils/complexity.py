"""Closed-form complexity estimates (reference
``benchmarks/complexity_analysis.py:86-235``)."""

from __future__ import annotations

import math
from typing import Optional


def polar_complexity(N: int, K: int, list_size: int = 1) -> dict:
    """Operation/memory counts for polar encode + SC/SCL decode
    (reference ``complexity_analysis.py:86-155``)."""
    n = int(math.log2(N))
    encode_ops = N * n                    # N·log2(N) XORs (:99)
    sc_ops = N + N * n                    # (:117-119)
    scl_ops = list_size * N * n           # (:134-136)
    return {
        "N": N,
        "K": K,
        "list_size": list_size,
        "encoding": {"xor_operations": encode_ops, "complexity": "O(N log N)"},
        "sc_decoding": {"operations": sc_ops, "complexity": "O(N log N)"},
        "scl_decoding": {"operations": scl_ops, "complexity": "O(L N log N)"},
        "memory": {"llr_values": N * (n + 1), "bit_values": N * (n + 1),
                   "scl_factor": list_size},
    }


def ldpc_complexity(n: int, k: int, dv: int = 3, dc: int = 6,
                    max_iterations: int = 20) -> dict:
    """Operation/memory counts for LDPC encode + BP decode
    (reference ``complexity_analysis.py:158-235``)."""
    m = n - k
    edges = n * dv
    encode_ops = m * k                                     # (:170)
    bp_ops = max_iterations * (n * 2 * dv + m * 3 * dc)    # (:195-200)
    return {
        "n": n,
        "k": k,
        "dv": dv,
        "dc": dc,
        "max_iterations": max_iterations,
        "encoding": {"operations": encode_ops, "complexity": "O(m k)"},
        "bp_decoding": {"operations": bp_ops, "complexity": "O(iter · edges)"},
        "memory": {"llr_values": n, "messages": 2 * edges},
    }


# -- roofline anchoring (north star: make "speed-of-light" measurable) -------
# TPU v5e (one chip): published peaks.  The FEC decoders are elementwise/
# VPU- and HBM-bound, not MXU matmul workloads, so MFU versus the bf16
# matmul peak is a deliberately conservative *upper-bound* denominator —
# it answers "how far from the chip's absolute ceiling is this", while the
# bandwidth bound below is the realistic speed-of-light for this workload.
V5E_PEAK_FLOPS_BF16 = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def decode_roofline(algorithmic_ops_per_frame: float,
                    frames_per_second: float,
                    state_bytes_per_frame: float | None = None) -> dict:
    """Achieved rate vs chip ceilings.

    ``algorithmic_ops_per_frame`` should come from the closed-form counts
    above (reference ``complexity_analysis.py`` semantics) so the figure is
    comparable across implementations; ``state_bytes_per_frame`` (optional)
    is the decoder's per-frame HBM traffic estimate for the bandwidth
    bound.
    """
    ops_per_s = algorithmic_ops_per_frame * frames_per_second
    out = {
        "algorithmic_ops_per_s": ops_per_s,
        "mfu_vs_bf16_peak": ops_per_s / V5E_PEAK_FLOPS_BF16,
    }
    if state_bytes_per_frame is not None:
        bytes_per_s = state_bytes_per_frame * frames_per_second
        out["hbm_utilization_estimate"] = bytes_per_s / V5E_HBM_BYTES_PER_S
    return out


def analyze_complexity(polar_params: Optional[dict] = None,
                       ldpc_params: Optional[dict] = None) -> dict:
    """Combined analysis (reference ``complexity_analysis.py:19-83``)."""
    polar_params = polar_params or {"N": 1024, "K": 512, "list_size": 8}
    ldpc_params = ldpc_params or {"n": 504, "k": 252, "dv": 3, "dc": 6,
                                  "max_iterations": 20}
    return {
        "polar": polar_complexity(**polar_params),
        "ldpc": ldpc_complexity(**ldpc_params),
    }
