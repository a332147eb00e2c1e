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

# Auto-build the optional native helpers (C++ COLMAP reader) when a
# compiler is available, so test_native.py exercises the real library
# instead of skipping. ~1 s once; no-op if already built or no g++.
import shutil  # noqa: E402
import subprocess  # noqa: E402

_so = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "upnerf", "native", "libcolmap_reader.so",
)
if not os.path.isfile(_so) and shutil.which("g++"):
    _build = os.path.abspath(
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(_so))),
                     "native", "build.sh")
    )
    try:
        subprocess.run(["sh", _build], check=True, capture_output=True,
                       timeout=120)
    except Exception:
        pass  # tests fall back to the importorskip path
