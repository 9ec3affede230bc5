from lantern_tpu.parallel.sharded import (  # noqa: F401
    ShardedIndex,
    build_sharded,
    make_mesh,
    search_sharded,
)
