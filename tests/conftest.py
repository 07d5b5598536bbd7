"""Test config: force CPU with 8 virtual devices for sharding tests.

Must set env before jax initializes (SURVEY.md §4e multi-host-on-CPU plan).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU plugin and sets
# jax_platforms="axon,cpu"; tests must run on the local virtual-8-device CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
