"""Test configuration: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's load-bearing test idea (SURVEY.md §4): GPU/device
kernel code is exercised on CPU. Here the same JAX code that runs on TPU
runs on host CPU, and multi-chip sharding is validated with
``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
