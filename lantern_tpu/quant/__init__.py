from lantern_tpu.quant.scalar import (  # noqa: F401
    binarize,
    dequantize_i8,
    quantize_i8,
)
from lantern_tpu.quant.pq import (  # noqa: F401
    PQCodebook,
    pq_decode,
    pq_encode,
    train_codebook,
)
