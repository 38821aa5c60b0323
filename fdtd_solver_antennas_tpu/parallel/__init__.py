from .sharding import (
    make_device_mesh,
    shard_fields,
    sharded_step_fn,
)
from .sweep_shard import (
    make_sweep_mesh,
    pad_batch,
    shard_sweep,
    trim_sweep_out,
)

__all__ = [
    "make_device_mesh",
    "shard_fields",
    "sharded_step_fn",
    "make_sweep_mesh",
    "pad_batch",
    "shard_sweep",
    "trim_sweep_out",
]
