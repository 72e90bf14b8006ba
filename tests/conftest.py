"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding behavior is exercised without TPU hardware by exposing 8
virtual CPU devices (the strategy SURVEY.md §4 prescribes for the rebuild).

NOTE: the environment exports ``JAX_PLATFORMS=axon`` (the TPU tunnel), so we
must overwrite — not setdefault. ``jax_num_cpu_devices`` is the JAX ≥0.8 way
to get multiple host devices (``--xla_force_host_platform_device_count`` no
longer takes effect here).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
