from .mesh import (
    make_mesh, param_shardings, param_specs, batch_sharding, replicated,
    shard_params, shard_batch, DATA_AXIS, MODEL_AXIS,
)
