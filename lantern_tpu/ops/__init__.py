from lantern_tpu.ops.distance import (  # noqa: F401
    l2sq_dist,
    cos_dist,
    hamming_dist,
    pairwise_dist,
    exact_search,
    pack_bits,
    unpack_bits,
)
