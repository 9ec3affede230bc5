from lantern_tpu.parallel.sharded import (  # noqa: F401
    ShardedIndex,
    build_sharded,
    build_sharded_device,
    compact_sharded,
    delete_sharded,
    flat_search_sharded,
    insert_sharded,
    load_sharded,
    local_exclude_masks,
    make_mesh,
    save_sharded,
    search_sharded,
)
