"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware (SURVEY.md §4:
the reference never tests multi-GPU without a cluster; we can).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A plugin may have imported jax before this conftest ran, in which case the
# env vars above were captured too late — set the config values directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
