"""Parallelism layer: device meshes, shardings, multi-host bootstrap."""

from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    data_sharding,
    make_mesh,
    maybe_initialize_distributed,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
