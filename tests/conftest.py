"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding behavior is exercised without TPU hardware by exposing 8
virtual CPU devices (the strategy SURVEY.md §4 prescribes for the rebuild).

NOTE: the environment exports ``JAX_PLATFORMS=axon`` (the TPU tunnel), so we
must overwrite — not setdefault. ``jax_num_cpu_devices`` is the JAX ≥0.8 way
to get multiple host devices (``--xla_force_host_platform_device_count`` no
longer takes effect here).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache (VERDICT r2 weak #5): the suite's
# wall-clock is dominated by multi-second jit compiles; caching them on disk
# makes every re-run (and every `pytest -n auto` worker) skip recompilation
# of unchanged programs. Safe to delete `cache/jax_compile_cache` any time.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cache", "jax_compile_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
