"""Test environment: force CPU backend with a virtual 8-device mesh so that
multi-chip sharding tests run without TPU hardware (SURVEY.md section 4).

The container registers a remote TPU ("axon") PJRT plugin at interpreter
startup and pins JAX_PLATFORMS=axon; jax.config.update is the reliable way
to redirect tests to the local CPU backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
