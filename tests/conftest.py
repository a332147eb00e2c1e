"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native "fake cluster" (SURVEY.md §4): multi-chip sharding
logic is validated on CPU with XLA's host-platform device-count override, so
tests never require TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU backend in every
# process and can override JAX_PLATFORMS from the environment; the config
# update below wins regardless, keeping tests on the local (virtual
# 8-device) CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: CPU eager-op compiles dominate test runtime
# otherwise (each jnp primitive compiles on first use, ~0.2 s each).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
