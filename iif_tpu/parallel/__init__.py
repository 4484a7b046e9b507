from iif_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    local_batch_slice,
    is_main_process,
    process_count,
    process_index,
    gather_objects,
    shard_pytree_by_rules,
    detection_tp_rules,
)
