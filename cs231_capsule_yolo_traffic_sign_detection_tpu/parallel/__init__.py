from .mesh import (  # noqa: F401
    initialize_distributed,
    global_batch_from_process_local,
    process_batch_slice,
    make_mesh,
    maybe_make_mesh,
    parse_mesh_spec,
    batch_sharding,
    replicated_sharding,
    shard_state,
    shard_batch,
    place_batch,
    routing_param_spec,
)
