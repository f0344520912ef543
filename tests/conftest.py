"""Test config: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize imports jax and pins JAX_PLATFORMS=axon at
interpreter start, so the env var alone is ignored — jax.config.update is
the reliable override (XLA_FLAGS is still read lazily at CPU-client init).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute integration runs "
        "(deselect with -m 'not slow' for the quick pass)")
