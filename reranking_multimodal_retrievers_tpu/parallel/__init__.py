from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from .tensor_parallel import (
    partition_spec as tp_partition_spec,
    shard_tree as tp_shard_tree,
    describe as tp_describe,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "tp_partition_spec",
    "tp_shard_tree",
    "tp_describe",
]
