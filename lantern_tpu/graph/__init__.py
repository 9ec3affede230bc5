from lantern_tpu.graph.host_build import HostHnsw  # noqa: F401
from lantern_tpu.graph.device import DeviceGraph, to_device  # noqa: F401
from lantern_tpu.graph.search import search, search_batched  # noqa: F401
