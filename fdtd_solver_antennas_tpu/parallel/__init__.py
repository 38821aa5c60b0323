from .sharding import (
    make_device_mesh,
    shard_fields,
    sharded_step_fn,
)

__all__ = ["make_device_mesh", "shard_fields", "sharded_step_fn"]
