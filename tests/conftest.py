"""Test configuration: 8-device virtual CPU mesh + float64 oracle mode.

Multi-chip sharding logic is exercised on a fake CPU mesh
(`xla_force_host_platform_device_count=8`), the TPU-world equivalent of a
fake backend (SURVEY.md §4).  Env vars must be set before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
