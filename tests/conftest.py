"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing multi-node behavior with local
processes only (lantern_hnsw/scripts/test_wal.py uses testgres clusters); we
use XLA's forced host platform device count instead of real TPU chips.
"""

import os

# Force an 8-device virtual CPU mesh. This environment pre-imports jax from
# sitecustomize (axon TPU plugin) and pre-sets JAX_PLATFORMS=axon, so setting
# env vars alone is not enough — flip the platform through jax.config before
# any backend initializes. Tests verify correctness and sharding on the CPU
# mesh; TPU perf runs happen via bench.py / manual drives.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped so every test sees the same stream regardless of
    # execution order (a shared session generator made data order-dependent)
    return np.random.default_rng(0xA47E60DB)  # the reference's header magic
