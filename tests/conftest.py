"""Test harness configuration.

Tests run on CPU with 8 emulated devices (SURVEY.md §4.3): the standard JAX
technique for exercising multi-chip `shard_map` paths without a pod. The same
distributed tests run unchanged on a real v5e-8 mesh.

Must run before the first `import jax` anywhere in the test process.
"""
import os

import jax  # noqa: E402

# The environment's sitecustomize overrides JAX_PLATFORMS, so the platform
# must be forced via jax.config (before any backend initialisation).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# Compiles are slow in this environment (remote-compile relay) even on CPU;
# a persistent on-disk cache makes repeated test runs fast. The directory
# is keyed by a host CPU-feature fingerprint (utils/cache.host_tag):
# sessions land on different machines, and XLA:CPU AOT entries compiled
# with a foreign feature set segfault on load (measured at 85% of a full
# run; see utils/cache.py).
from oc_nbody_tpu.utils.cache import host_tag  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    f".jax_cache-{host_tag()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
