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

# Pin the physics factorization-reuse interval to 1 (exact semantics) for
# env-level tests: R>1 traces TWO substep instantiations per control step,
# nearly doubling the already 1-core-host-limited env compile times, and the
# reuse path has its own dedicated gates (test_kernel.py R=5 equivalence,
# test_mujoco_golden.py batched-R5 golden) that construct engines explicitly.
os.environ.setdefault("LHW_PHYSICS_REUSE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: humanoid env step/reset compiles cost ~40 s each
# on CPU; cache them across test runs. Host-salted: entries compiled on a
# previous physical host segfault on load (utils/cache.py docstring).
from learninghumanoidwalking_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/lhw_jax_cache2", min_compile_secs=2.0)

# ---------------------------------------------------------------------------
# In-tree hang guard (pytest-timeout is not installable in the pinned image).
#
# Two layers per test:
#   1. soft: SIGALRM raises in the test as soon as the interpreter regains
#      control — catches Python-level hangs and runaway loops with a normal
#      test failure;
#   2. hard: a faulthandler watchdog thread dumps all stacks and aborts the
#      whole process at 4x the soft limit — catches hangs inside C/XLA where
#      signals can't be delivered, so CI fails instead of hanging forever.
# Override per run with LHW_TEST_TIMEOUT (seconds; 0 disables both).
# Default is generous because a single cold XLA:CPU compile on a 1-core host
# can legitimately take ~7 minutes (see VERDICT round-2/3 timing notes).
# ---------------------------------------------------------------------------
import faulthandler  # noqa: E402
import signal  # noqa: E402

import pytest  # noqa: E402

_TEST_TIMEOUT_S = int(os.environ.get("LHW_TEST_TIMEOUT", "900"))


@pytest.fixture(autouse=True)
def _hang_guard(request):
    if _TEST_TIMEOUT_S <= 0 or not hasattr(signal, "SIGALRM"):
        yield
        return

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded LHW_TEST_TIMEOUT={_TEST_TIMEOUT_S}s (soft hang guard); "
            f"hard abort at {4 * _TEST_TIMEOUT_S}s"
        )

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(_TEST_TIMEOUT_S)
    faulthandler.dump_traceback_later(4 * _TEST_TIMEOUT_S, exit=True)
    try:
        yield
    finally:
        faulthandler.cancel_dump_traceback_later()
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
