#!/usr/bin/env python
"""Oracle-layer introspection — counterpart of the reference's
``debug_scripts/inspect_polarcodes.py`` and ``check_lib_decoder_type.py``
(which print what the third-party ``polarcodes``/``pyldpc`` installations
expose and which decoder the wrapper actually calls).

Here the oracle layer is import-gated (SURVEY L2b; the libraries are not
installed in this environment), so this tool reports, for each oracle:

* whether the real library imports, and if so which decoder/construction
  entry points the wrapper would call;
* otherwise, which executable fallback stands in (the NumPy
  reimplementation ``oracle/constructions_np.py``), what it produces, and
  where the committed real-library fixture lives.

Usage: python tools/inspect_oracle.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from polarcode_and_ldpc_tpu import oracle
    from polarcode_and_ldpc_tpu.oracle import constructions_np

    print("=== polar oracle (wraps `polarcodes`) ===")
    print(f"oracle_available('polar'): {oracle.oracle_available('polar')}")
    try:
        import polarcodes

        print(f"polarcodes IMPORTS: {polarcodes.__file__}")
        print("wrapper entry points present:",
              [a for a in ("PolarCode", "Construct", "Encode", "Decode")
               if hasattr(polarcodes, a)],
              "— decode path: Decode(pc, decoder_name='scd') "
              "(reference polar_wrapper.py:71-91)")
    except ImportError as e:
        print(f"polarcodes NOT installed ({e.__class__.__name__})")
    frozen, backend = oracle.oracle_polar_frozen_set(64, 32,
                                                     design_snr_db=2.0)
    print(f"oracle_polar_frozen_set(64, 32) via backend={backend!r}:")
    print(f"  frozen[:10] = {np.asarray(frozen)[:10]} "
          f"({len(frozen)} positions)")

    print("\n=== LDPC oracle (wraps `pyldpc`) ===")
    print(f"oracle_available('ldpc'): {oracle.oracle_available('ldpc')}")
    try:
        import pyldpc

        print(f"pyldpc IMPORTS: {pyldpc.__file__}")
        print("wrapper entry points present:",
              [a for a in ("make_ldpc", "decode", "get_message")
               if hasattr(pyldpc, a)],
              "— decode path: pyldpc.decode + get_message with the "
              "SNR back-estimation heuristic (ldpc_wrapper.py:94-124)")
    except ImportError as e:
        print(f"pyldpc NOT installed ({e.__class__.__name__})")
    H, G, backend = oracle.oracle_ldpc_matrices(48, dv=3, dc=6, seed=0)
    print(f"oracle_ldpc_matrices(48, 3, 6) via backend={backend!r}: "
          f"H {H.shape}, G {G.shape} (pyldpc tall orientation); "
          f"H@G % 2 all-zero: "
          f"{bool(((np.asarray(H) @ np.asarray(G)) % 2 == 0).all())}")

    fx = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "oracle_schema_fixture.json")
    print(f"\ncommitted real-library fixture: {fx} "
          f"(exists: {os.path.exists(fx)}) — provenance pinned in "
          "tools/make_oracle_fixture.py")
    print("\n=== decoder the BENCHMARKS actually use ===")
    print("self-implementation path: models/polar/scanscl.py (chunk-scan "
          "SCL, exact semantics); differential vs the reimplemented "
          "construction: cli/oracle_differential.py "
          "(results/oracle_differential/, 200k frames/point)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
