from lantern_tpu.utils.logger import Logger, LogLevel  # noqa: F401
from lantern_tpu.utils.failpoints import (  # noqa: F401
    failure_point,
    failure_point_enable,
    failure_point_disable_all,
)
