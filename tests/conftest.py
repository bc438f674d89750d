"""Test configuration: force CPU backend with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multichip path); float64 is enabled for oracle-precision checks.
"""

import os
import sys

# Force the CPU backend: unit tests must not ride the (slow, single-chip)
# TPU tunnel; multi-device sharding is exercised on the virtual CPU mesh.
# NOTE: the environment's sitecustomize registers the axon TPU plugin and
# overrides JAX_PLATFORMS, so the env var alone is not enough — the
# jax.config update below is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
