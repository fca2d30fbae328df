#!/usr/bin/env python
"""A/B the Pallas vs XLA SCL chunk bodies with throughput-true timing.

The first probe (tools/pallas_tpu_probe.py stage 3) forced a host
round-trip per call, so both sides measured ~750 ms of tunnel latency on
a ~36 ms program.  This probe times like bench.py: chain ``iters``
dispatches, force ONE output element at the end, divide.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    from polarcode_and_ldpc_tpu.models.polar.construction import (
        construct_polar_code, frozen_mask_from_positions)
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan

    rng = np.random.default_rng(0)
    N, K, L, Bsz = 1024, 512, 8, 8192
    frozen, _ = construct_polar_code(N, K)
    mask = frozen_mask_from_positions(N, frozen)
    llr = jnp.asarray(rng.standard_normal((Bsz, N)).astype(np.float32) * 2.0)

    outs = {}
    for impl in ("pallas", "xla"):
        dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=128,
                                            body_impl=impl))
        t0 = time.time()
        u, m = dec(llr)
        np.asarray(m)[0, 0]
        print(f"{impl}: compile+first {time.time()-t0:.1f}s", flush=True)
        outs[impl] = (np.asarray(u), np.asarray(m))
        iters = 10
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                u, m = dec(llr)
            np.asarray(m)[0, 0]
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{impl}: steady {best*1e3:.1f} ms → {Bsz*K/best/1e6:.1f} Mbps",
              flush=True)
    ok = (outs["xla"][0] == outs["pallas"][0]).all() and np.allclose(
        outs["xla"][1], outs["pallas"][1])
    print(f"bit-exact match: {ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
