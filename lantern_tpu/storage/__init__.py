from lantern_tpu.storage.snapshot import (  # noqa: F401
    HEADER_MAGIC,
    HEADER_VERSION,
    InsertLog,
    load_snapshot,
    save_snapshot,
)
