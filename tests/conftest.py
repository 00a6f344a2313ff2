"""Test configuration: force an 8-device virtual CPU platform.

This replaces the reference's 2-GPU SyncBN test requirement (SURVEY.md §4):
multi-device behavior is validated against 8 simulated host devices.

Note: the environment may pre-import jax with a TPU platform via
sitecustomize, so plain env vars are too late here; jax.config.update works
because backends initialize lazily at first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Golden tests compare against float64 numpy references; pin matmuls to
# full float32 (production code keeps the fast TPU default).
jax.config.update("jax_default_matmul_precision", "highest")
