"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4 implication (f)).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS at interpreter startup; override it back so the test suite
# runs on the 8-device virtual CPU mesh and never touches the real chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache for the CPU suite: the heavy jit programs
# (k=16 SCG chains in the gate tests, pipeline/collage scans) compile once
# per machine instead of once per pytest invocation.  Keyed by backend +
# XLA flags, so the 8-device virtual mesh entries never collide with the
# TPU cache (which uses .jax_cache via JAX_COMPILATION_CACHE_DIR).
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
