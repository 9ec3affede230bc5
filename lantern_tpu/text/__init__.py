from lantern_tpu.text.bloom import Bloom  # noqa: F401
from lantern_tpu.text.bm25 import Bm25Index, create_bm25_table  # noqa: F401
from lantern_tpu.text.stemmer import (  # noqa: F401
    DEFAULT_STOPWORDS,
    porter_stem,
    text_to_stem_array,
)
