"""Flagship "model" registry.

This framework's models are its index structures (the compute graph a query
runs against), not neural networks:

- :class:`~lantern_tpu.index.Index` — the user-facing HNSW index facade
- :class:`~lantern_tpu.graph.device.DeviceGraph` — the device-resident graph
- :class:`~lantern_tpu.parallel.sharded.ShardedIndex` — the multi-chip graph

They are re-exported here so the conventional ``lantern_tpu.models`` entry
point resolves to the flagship artifacts.
"""

from lantern_tpu.graph.device import DeviceGraph  # noqa: F401
from lantern_tpu.index import Index  # noqa: F401
from lantern_tpu.parallel.sharded import ShardedIndex  # noqa: F401

__all__ = ["Index", "DeviceGraph", "ShardedIndex"]
