from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    replicate,
    pad_to_multiple,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
]
