"""lantern-tpu: a TPU-native vector index and search framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of Lantern
(lanterndata/lantern, a PostgreSQL HNSW extension — see SURVEY.md):

- HNSW graph index over dense vectors with l2sq / cosine / hamming metrics
  (reference: lantern_hnsw/src/hnsw.c:354-405 distance UDFs,
  lantern_hnsw/src/hnsw/scan.c search path).
- Batched, device-resident beam search: per-query pointer chasing becomes
  batched frontier expansion over an HBM-resident padded CSR neighbor array.
- Batched graph construction replacing the single-tuple insert path
  (lantern_hnsw/src/hnsw/insert.c) and the multi-threaded external index
  server (lantern_cli/src/external_index/server.rs).
- Product quantization (codebook k-means + asymmetric-distance search) and
  scalar quantization (f16 / i8 / 1-bit), mirroring
  lantern_hnsw/src/hnsw/product_quantization.c and options.c quant_bits.
- Snapshot/restore, structural validation, cost model, autotuning, ingest
  service, and the surrounding ecosystem (BM25, bloom, stemming, dataset
  loaders, embeddings) from lantern_cli / lantern_extras.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: every distinct program shape costs a slow
# compile in TPU environments (a remote-compile tunnel here); caching across
# processes makes bench/service restarts cheap. Disable: LANTERN_TPU_JAX_CACHE=0.
if (
    _os.environ.get("LANTERN_TPU_JAX_CACHE", "1") != "0"
    # CPU-backend processes (the virtual-mesh test suite, dryrun) skip the
    # persistent cache entirely: CPU compiles are cheap, and serializing /
    # deserializing XLA:CPU AOT executables for some shard_map programs
    # SEGFAULTS/aborts in this jaxlib (r3: intermittent suite crashes in
    # compilation_cache.put/get_executable_and_time). The cache exists for
    # the TPU remote-compile tunnel (30-90 s per program).
    and _os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu"
):
    try:
        import jax as _jax

        def _machine_cache_dir() -> str:
            # The cache dir is fingerprinted by the host CPU: XLA:CPU cache
            # entries are AOT executables keyed only by program, so an entry
            # written on a machine with different CPU features aborts (or
            # SIGILLs) when DESERIALIZED here — observed as a hard abort in
            # compilation_cache.get_executable_and_time when /tmp survived
            # from a different host. TPU entries are unaffected either way.
            import hashlib
            import platform

            fp = platform.machine()
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            fp += line
                            break
            except OSError:
                pass
            tag = hashlib.md5(fp.encode()).hexdigest()[:8]
            return f"/tmp/lantern_tpu_jax_cache_{tag}"

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_CACHE_DIR", _machine_cache_dir()),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — never block import on cache setup
        pass

from lantern_tpu.config import (  # noqa: F401
    Metric,
    QuantKind,
    HnswParams,
    SearchParams,
)
from lantern_tpu.index import Index  # noqa: F401
