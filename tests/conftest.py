"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding tests exercise multi-chip paths without TPUs via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4).
Must set flags before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin ('axon') ignores the JAX_PLATFORMS env var;
# the config knob does take effect before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
