"""Persistent XLA compilation cache setup.

Compiles in this environment go through a slow remote-compile path, so every
entry point (CLI, bench, graft) enables JAX's on-disk compilation cache.
Harmless elsewhere. Call before the first jit execution.
"""
from __future__ import annotations

import os

import jax

def host_tag() -> str:
    """Short fingerprint of this host's CPU feature set.

    Cache entries (and the repo-local test cache) persist across
    sessions, but sessions land on DIFFERENT machines: XLA:CPU AOT
    executables compiled with another host's feature flags load anyway
    and then SIGILL/segfault (measured: a full test run died at 85% in
    ``compilation_cache.get_executable_and_time`` loading an entry whose
    compile features included ``prefer-no-scatter`` this host lacks).
    Keying the cache directory by the feature set makes a foreign host
    start a fresh cache instead of loading incompatible machine code."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha1(f"{platform.machine()}|{flags}".encode()).hexdigest()
    return h[:12]


_DEFAULT = os.environ.get(
    "OC_NBODY_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "oc_nbody_tpu",
                 f"xla-{host_tag()}"),
)


def enable_compile_cache(path: str | None = None) -> None:
    # OCN_DISABLE_COMPILE_CACHE=1 makes this a no-op. The test harness
    # sets it: CLI tests call __main__.main() IN-PROCESS, and the cache
    # dir it installs is process-global — a later unrelated test's
    # compile then writes a cache entry through XLA:CPU executable
    # serialization, which segfaulted full-suite runs twice at ~85%
    # (see tests/conftest.py).
    if os.environ.get("OCN_DISABLE_COMPILE_CACHE") == "1":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
