"""Test configuration: 8-device virtual CPU mesh + float64 oracle mode.

Multi-chip sharding logic is exercised on a fake CPU mesh
(`xla_force_host_platform_device_count=8`), the TPU-world equivalent of a
fake backend (SURVEY.md §4).

NOTE: this image's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and the ambient env pins JAX_PLATFORMS=axon, so plain
env-var settings are too late/overridden.  Backend selection is lazy,
though — `jax.config.update` before first device use still wins, and
XLA_FLAGS is read at CPU-client creation.  Tests must never touch the
single real TPU chip (concurrent processes deadlock on it).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()
