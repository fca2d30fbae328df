#!/usr/bin/env python
"""Step-by-step SC LLR/bit trace (reference
``debug_scripts/trace_llr_updates.py``): dumps the decision LLR and bit per
leaf in decode order for a small code, and cross-checks the device decoder.

Usage: python tools/trace_llr_updates.py [--N 8] [--snr 2.0]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=8)
    ap.add_argument("--snr", type=float, default=2.0)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.parity.channel_np import awgn_llr_np
    from polarcode_and_ldpc_tpu.parity.polar_np import polar_encode_np
    from polarcode_and_ldpc_tpu.utils.tracing import trace_sc_trellis

    N, K = args.N, args.N // 2
    rng = np.random.default_rng(1)
    frozen, info = fec.construct_polar_code(N, K)
    dec = fec.SCDecoder(N, K, frozen_bits=frozen, dtype=jnp.float64)
    msg = rng.integers(0, 2, K)
    cw = polar_encode_np(msg, N, info)
    llr = awgn_llr_np(cw, args.snr, rng.standard_normal(N))
    print(f"message {msg}  codeword {cw}")
    print(f"channel LLRs {np.round(llr, 2)}")
    trace = trace_sc_trellis(llr, dec.frozen_mask)
    for s in trace["steps"]:
        tag = "frozen" if s["frozen"] else "info  "
        print(f"step {s['step']:3d} leaf {s['leaf']:3d} [{tag}] "
              f"LLR {s['decision_llr']:+8.3f} -> bit {s['bit']}")
    device_u = np.asarray(dec.decode_full(llr))
    match = (device_u == trace["u"]).all()
    print(f"device decoder match: {'OK' if match else 'MISMATCH'}")
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
