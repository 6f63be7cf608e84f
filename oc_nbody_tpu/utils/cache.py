"""Persistent XLA compilation cache setup.

Compiles in this environment go through a slow remote-compile path, so every
entry point (CLI, bench, graft) enables JAX's on-disk compilation cache.
Harmless elsewhere. Call before the first jit execution.
"""
from __future__ import annotations

import os

import jax

_DEFAULT = os.environ.get(
    "OC_NBODY_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "oc_nbody_tpu", "xla"),
)


def enable_compile_cache(path: str | None = None) -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
