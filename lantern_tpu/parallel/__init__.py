from lantern_tpu.parallel.sharded import (  # noqa: F401
    ShardedIndex,
    build_sharded,
    build_sharded_device,
    flat_search_sharded,
    make_mesh,
    search_sharded,
)
