from jckx.parallel.mesh import (  # noqa: F401
    make_mesh,
    parse_mesh_shape,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    local_batch_size,
    tp_state_sharding,
    spatial_sharding,
    DATA_AXIS,
    MODEL_AXIS,
)
