from .mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_state,
    shard_batch,
    routing_param_spec,
)
