"""Device-mesh construction and sharding helpers.

The single SPMD replacement for the reference's entire distribution stack
(SURVEY.md §2.10): PyTorch-Lightning DDP + ``torchrun`` (grad sync), the
ColBERT ``Launcher`` (per-rank ``mp.Process`` + NCCL rendezvous,
`colbert/infra/launcher.py:22-117`), ``dist.all_gather`` for in-batch
negatives (`modeling_flmr.py:1127-1194`), and the rank-0 barriers in eval
(`FLMR_base_executor.py:732-790`). One ``jax.sharding.Mesh`` over ICI: data
parallelism is batch sharding, collectives are compiler-inserted, barriers
disappear.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data[, model]) mesh over the available devices.

    With ``n_model == 1`` the mesh is 1-D over the data axis — the layout for
    everything the reference does (DP training, sharded corpus scoring).
    ``n_model > 1`` reserves an inner axis for tensor-parallel layouts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh wants {n_data} (data) x {n_model} (model) = "
            f"{n_data * n_model} devices but only {len(devices)} are "
            "available — lower --n_devices / n_model or add devices "
            "(XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU)")
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh, tree, axis: int = 0):
    """Shard every array in a pytree along ``axis`` over the data axis."""

    def _shard(x):
        spec = [None] * x.ndim
        spec[axis] = DATA_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(_shard, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, fill=0):
    """Pad a host array so ``x.shape[axis]`` divides ``multiple`` (static
    shapes for pjit); returns (padded, original_length)."""
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(x, pad_width, constant_values=fill), n
