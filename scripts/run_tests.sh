#!/usr/bin/env bash
# Segfault-resilient test runner.
#
# XLA:CPU persistent-cache entries embed host AOT machine code; a poisoned
# entry (cross-host migration with a colliding salt, or a writer killed
# mid-write) makes jax's compilation_cache.get_executable_and_time SEGFAULT
# the whole pytest process (observed twice; utils/cache.py docstring). The
# salt makes this rare, not impossible — this wrapper automates the
# documented recovery: on a segfault exit (139 / SIGSEGV) with the cache
# loader on the crash stack, quarantine the salted cache dir and rerun the
# suite once, cold.
#
# Usage: scripts/run_tests.sh [pytest args...]   (defaults to tests/ -q)
set -u

CACHE_BASE="${LHW_CACHE_BASE:-/tmp/lhw_jax_cache2}"
QUARANTINE="${LHW_CACHE_QUARANTINE:-/tmp/lhw_cache_quarantine}"
LOG="$(mktemp /tmp/lhw_pytest.XXXXXX.log)"
ARGS=("$@")
[ ${#ARGS[@]} -eq 0 ] && ARGS=(tests/ -q)

run_suite() {
  python -m pytest "${ARGS[@]}" 2>&1 | tee "$LOG"
  return "${PIPESTATUS[0]}"
}

run_suite
rc=$?

if [ "$rc" -ge 128 ] && grep -q "compilation_cache.*get_executable_and_time\|cpu_aot_loader" "$LOG"; then
  salt=$(python -c "from learninghumanoidwalking_tpu.utils.cache import host_salt; print(host_salt())")
  if [ -d "$CACHE_BASE/$salt" ]; then
    mkdir -p "$QUARANTINE"
    mv "$CACHE_BASE/$salt" "$QUARANTINE/$salt.$(date +%s)"
    echo "run_tests.sh: segfault in the XLA compile-cache loader detected;" \
         "quarantined $CACHE_BASE/$salt — rerunning the suite cold" >&2
    run_suite
    rc=$?
  fi
fi

rm -f "$LOG"
exit "$rc"
