#!/usr/bin/env python
"""Multi-host Monte-Carlo rehearsal: 2 real processes, jax.distributed,
a global 8-device mesh (4 virtual CPU devices per process), scalar-reduced
counters — the exact pod execution shape, runnable anywhere.

Verifies that the 2-process sharded run reproduces the single-process
counts bit-for-bit (per-frame RNG keyed by global frame id makes results
layout-invariant).

Usage: python tools/multihost_rehearsal.py
"""

import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

WORKER = r"""
import os, sys, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
import numpy as np
import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.parallel import default_mesh
from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_polar_pipeline

assert len(jax.devices()) == 4 * nproc, jax.devices()
# flagship decoder path (N>=512 auto-selects the chunk-scan SCL) with a
# mid-chunk max_errors crossing: exercises the exact on-device trim in
# scalar (multi-host) reduction under real multi-process collectives
frozen, _ = fec.construct_polar_code(512, 256, "bhattacharyya", 2.0)
step = make_polar_pipeline(512, 256, frozen, -3.0, decoder="scl", list_size=2)
sim = MonteCarloSimulator(step, 256, chunk_frames=256,
                          mesh=default_mesh(), reduction="scalar")
res = sim.run(2048, max_errors=25, seed=17)
if pid == 0:
    print(json.dumps({"frames": res.frames, "bit_errors": res.bit_errors,
                      "frame_errors": res.frame_errors}), flush=True)
"""


def main() -> int:
    port = "12765"
    env = dict(os.environ, PYTHONPATH=str(ROOT))
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(pid), "2", port],
                         env=env, cwd=ROOT,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"worker {pid} failed (rc={p.returncode}):\n{err[-2000:]}")
            return 1
    import json

    dist = json.loads(outs[0][0].strip().splitlines()[-1])
    print(f"2-process × 4-device result: {dist}")

    # single-process ground truth (same global frame ids ⇒ identical counts)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import polarcode_and_ldpc_tpu as fec
    from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_polar_pipeline

    frozen, _ = fec.construct_polar_code(512, 256, "bhattacharyya", 2.0)
    step = make_polar_pipeline(512, 256, frozen, -3.0, decoder="scl",
                               list_size=2)
    res = MonteCarloSimulator(step, 256, chunk_frames=256).run(
        2048, max_errors=25, seed=17)
    single = {"frames": res.frames, "bit_errors": res.bit_errors,
              "frame_errors": res.frame_errors}
    print(f"single-process result:        {single}")
    ok = dist == single
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
