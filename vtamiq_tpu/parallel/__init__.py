from .mesh import (
    make_mesh, param_shardings, param_specs, batch_sharding, replicated,
    shard_params, shard_batch, DATA_AXIS, MODEL_AXIS,
)
from .ring_attention import (
    make_ring_attention, make_ring_attention_fn, make_seq_mesh, SEQ_AXIS,
)
