"""Shared CLI plumbing: argument surface compatible with the reference CLIs
(train.py:30-37, inference.py:328-334) mapped onto the TPU runtime."""

from __future__ import annotations

import argparse
import os


def add_train_args(parser: argparse.ArgumentParser):
    parser.add_argument("--config_mv", "-cmv", type=str, required=True)
    parser.add_argument("--config_t", "-ct", type=str, required=True)
    parser.add_argument("--exp_key", "-ekey", type=str, default=None, help="experiment key (metrics resume)")
    parser.add_argument("--debug_mode", "-d", action="store_true", help="local run, no external logger")
    parser.add_argument("--precision", "-p", type=str, default="default", choices=["default", "highest", "bfloat16"])
    parser.add_argument("--device", "-g", type=str, default=None, help="device selector (e.g. 'cpu' to force CPU)")
    parser.add_argument("--run_dir", type=str, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--profile",
        action="store_true",
        help="collect a jax.profiler trace of the first trained epoch into <run_dir>/profile",
    )
    return parser


def apply_device_selection(device: str | None):
    """Apply a platform selection that actually sticks on this runtime.

    The axon TPU plugin IGNORES the ``JAX_PLATFORMS`` environment variable,
    and with the tunnel down its backend probe can hang indefinitely — so a
    caller exporting ``JAX_PLATFORMS=cpu`` (the standard JAX idiom) would
    still hang.  Honor the env var explicitly through ``jax.config`` (which
    the plugin does respect), with the CLI flag taking precedence."""
    device = device or os.environ.get("JAX_PLATFORMS")
    if device:
        import jax

        jax.config.update("jax_platforms", device)


def apply_runtime_flags(args):
    """Device + precision selection. The reference pins a GPU via
    CUDA_VISIBLE_DEVICES and sets matmul precision (train.py:45-46); the TPU
    equivalents are platform selection and default matmul precision."""
    import jax

    apply_device_selection(args.device)
    if args.precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")
    dtype = None
    if args.precision == "bfloat16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    return dtype


def default_run_dir(config_t: dict, kind: str) -> str:
    base = config_t.get("base_root_dir", "runs")
    name = f"{config_t.get('project_name', kind)}_{config_t.get('run_name', 'run')}"
    return os.path.join(base, name)
