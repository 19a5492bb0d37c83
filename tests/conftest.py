"""Test configuration: force an 8-device virtual CPU mesh so sharding tests run
anywhere (SURVEY.md §4 test strategy). Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# re-force CPU so unit tests are deterministic and run the virtual 8-dev mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
