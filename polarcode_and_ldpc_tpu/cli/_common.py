"""Shared CLI plumbing: platform/mesh flags, SNR-range parsing."""

from __future__ import annotations

import argparse
import os


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. cpu, tpu); default: ambient")
    parser.add_argument("--host-devices", type=int, default=0,
                        help="simulate N CPU devices (sets "
                             "--xla_force_host_platform_device_count)")
    parser.add_argument("--mesh", action="store_true",
                        help="shard frames over all visible devices")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host pod run: call jax.distributed."
                             "initialize() before anything else (implies --mesh)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output-dir", default="results")


def setup_platform(args) -> None:
    """Apply platform flags. Must run before any other JAX use."""
    if args.host_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.host_devices}")
        if args.platform is None:
            args.platform = "cpu"
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "distributed", False):
        jax.distributed.initialize()
        args.mesh = True


def get_mesh(args):
    if not getattr(args, "mesh", False):
        return None
    from ..parallel import default_mesh

    return default_mesh()


def parse_snr_range(spec: str):
    """``start:stop:step`` → (start, stop, step) (reference
    ``run_benchmark.py:31-38``)."""
    start, stop, step = (float(x) for x in spec.split(":"))
    return start, stop, step
