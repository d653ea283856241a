"""Persistent-XLA-cache helpers: host-salted cache directories.

XLA:CPU cache entries embed AOT machine code specialized to the compiling
host's exact CPU features. This VM image migrates between physical hosts,
and loading an entry compiled on a previous host is fatal (observed: a hard
segfault inside jax's compilation_cache.get_executable_and_time, plus
cpu_aot_loader "machine type ... doesn't match" errors warning of SIGILL).
Salting the cache path with a hash of the host's CPU feature flags makes
stale-host entries unreachable instead of fatal — each distinct host gets
its own subdirectory and simply recompiles cold once.
"""

from __future__ import annotations

import hashlib
import os


def host_salt() -> str:
    """Short stable id of this host's CPU identity.

    Hashes the model identity lines (vendor/family/model/stepping/name) in
    addition to the feature flags: LLVM derives per-microarchitecture tuning
    features (e.g. +prefer-no-gather) from the CPU *model*, so two hosts can
    expose identical /proc/cpuinfo flag lines yet produce mutually
    incompatible AOT code (observed: segfault in
    compilation_cache.get_executable_and_time after a VM migration whose
    flags-only salt collided; cpu_aot_loader flagged '+prefer-no-gather is
    not supported on the host machine')."""
    keys = ("flags", "Features", "vendor_id", "cpu family", "model",
            "model name", "stepping", "CPU implementer", "CPU part")
    ident: dict[str, str] = {}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in keys and k not in ident:
                    ident[k] = line.strip()
    except OSError:
        pass
    if not ident:
        return "nocpuinfo"
    blob = "\n".join(ident[k] for k in keys if k in ident)
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


def enable_compile_cache(base: str, min_compile_secs: float = 2.0) -> str | None:
    """Point jax's persistent compile cache at <base>/<subdir>.

    subdir is the host salt for the CPU backend (whose AOT entries embed
    host machine code — the segfault case) and the backend name otherwise:
    TPU executables are device-targeted, so sharing them across hosts is
    safe and keeps a repo-shipped cache warm wherever the driver lands.

    Returns the directory used, or None if no candidate was writable.
    """
    import jax

    # The primary (first) platform decides the subdir: plugins register
    # themselves as e.g. "axon,cpu" where cpu is only the fallback, and all
    # jit executables target the first entry. Only a cpu PRIMARY needs the
    # host salt.
    # INVARIANT: when the primary platform is not cpu, no jit in this repo
    # may compile with an explicit backend="cpu" / cpu-device sharding —
    # such an executable would be persisted UNSALTED into the shared subdir
    # and reintroduce the cross-host CPU-AOT segfault. Tests and dryruns
    # that want the CPU backend must set jax_platforms="cpu" (making cpu
    # primary) BEFORE calling this, as tests/conftest.py does.
    platforms = jax.config.jax_platforms
    if platforms and platforms.split(",")[0] != "cpu":
        subdir = platforms.split(",")[0]
    elif platforms:  # explicit cpu
        subdir = host_salt()
    else:
        try:
            backend = jax.default_backend()
        except Exception:  # device discovery failed (e.g. TPU tunnel down)
            backend = "cpu"
        subdir = host_salt() if backend == "cpu" else backend
    path = os.path.join(base, subdir)
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
