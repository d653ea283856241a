"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The driver benches on the single real TPU chip; tests exercise correctness
and multi-chip sharding on the CPU backend (XLA semantics are identical).
The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so we
force the platform through jax.config before any device is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: humanoid env step/reset compiles cost ~40 s each
# on CPU; cache them across test runs. Host-salted: entries compiled on a
# previous physical host segfault on load (utils/cache.py docstring).
from learninghumanoidwalking_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/lhw_jax_cache2", min_compile_secs=2.0)
