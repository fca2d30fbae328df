#!/usr/bin/env python
"""Config sweep for the Pallas-bodied chunk-scan SCL decoder.

Finds the bench config: chunk size trades body-compile time (fewer,
bigger unique bodies) against glue overhead (more chunks); batch trades
dispatch amortization against VMEM/HBM pressure.  Timing is
throughput-true (chained dispatches, single forced fetch).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

CONFIGS = [  # (chunk, batch)
    (64, 8192),
    (64, 16384),
    (128, 16384),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    from polarcode_and_ldpc_tpu.models.polar.construction import (
        construct_polar_code, frozen_mask_from_positions)
    from polarcode_and_ldpc_tpu.models.polar.scanscl import make_scl_decoder_scan

    rng = np.random.default_rng(0)
    N, K, L = 1024, 512, 8
    frozen, _ = construct_polar_code(N, K)
    mask = frozen_mask_from_positions(N, frozen)

    for chunk, Bsz in CONFIGS:
        llr = jnp.asarray(rng.standard_normal((Bsz, N)).astype(np.float32) * 2)
        dec = jax.jit(make_scl_decoder_scan(N, mask, L, chunk=chunk,
                                            body_impl="pallas"))
        t0 = time.time()
        u, m = dec(llr)
        np.asarray(m)[0, 0]
        print(f"chunk={chunk} B={Bsz}: compile+first {time.time()-t0:.1f}s",
              flush=True)
        iters = 10
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                u, m = dec(llr)
            np.asarray(m)[0, 0]
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"chunk={chunk} B={Bsz}: steady {best*1e3:.1f} ms → "
              f"{Bsz*K/best/1e6:.1f} Mbps", flush=True)
        del dec, u, m, llr
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
