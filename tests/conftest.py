"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU so that the mesh/pjit paths are exercised without TPU
hardware (SURVEY.md §4: multi-device CPU simulation). Must be set before jax
is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compile cache: the suite's dominant cost is re-compiling the
# same train/decode graphs; the cache cuts repeat runs dramatically
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ssd_tpu_test_jax_cache")

# The axon TPU plugin can override JAX_PLATFORMS; pin via jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
