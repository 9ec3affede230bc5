"""ctypes binding for the native HNSW engine (hnsw_engine.cpp).

Compiled on demand with g++ (no pybind11 in this environment; plain C ABI).
``NativeHnsw`` is duck-type compatible with graph.host_build.HostHnsw, so
``graph.device.to_device`` accepts either.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

from lantern_tpu.config import HnswParams, Metric

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hnsw_engine.cpp")
from lantern_tpu.graph.host_build import LMAX  # single source of truth
# (hnsw_engine.cpp's LMAX constant must match — asserted at lib build)


def _build_lib(sanitize: bool = False) -> str:
    """Compile the engine (hash-keyed cache). ``sanitize=True`` builds an
    ASAN+UBSAN variant — the reference runs sanitizer builds in CI
    (.github/workflows/sanitizer-build-and-test.yaml,
    lantern_hnsw/scripts/sanitizers/); tests/test_sanitizer.py drives this
    one in a subprocess with the asan runtime preloaded."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "LANTERN_TPU_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "lantern_tpu_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    tag = "_asan" if sanitize else ""
    so = os.path.join(cache_dir, f"libhnsw_{digest}{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread",
        ]
        if sanitize:
            cmd += [
                "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
                "-g", "-O1",
            ]
        cmd += ["-o", tmp, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    return so


_lib = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_lib())
        lib.ldb_index_new.restype = ctypes.c_void_p
        lib.ldb_index_new.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.ldb_index_free.argtypes = [ctypes.c_void_p]
        lib.ldb_index_add.restype = ctypes.c_int64
        lib.ldb_index_add.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.ldb_index_search.restype = ctypes.c_int32
        lib.ldb_index_search.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.ldb_index_mark_deleted.restype = ctypes.c_int64
        lib.ldb_index_mark_deleted.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.ldb_index_stats.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        for name in (
            "ldb_index_vectors", "ldb_index_neighbors0", "ldb_index_counts0",
            "ldb_index_upper_neighbors", "ldb_index_upper_counts",
            "ldb_index_upper_slot", "ldb_index_levels", "ldb_index_labels",
            "ldb_index_deleted",
        ):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_void_p
            fn.argtypes = [ctypes.c_void_p]
        lib.ldb_index_error.restype = ctypes.c_char_p
        lib.ldb_index_error.argtypes = [ctypes.c_void_p]
        lib.ldb_index_grow.restype = ctypes.c_int32
        lib.ldb_index_grow.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ldb_index_import.restype = ctypes.c_int32
        lib.ldb_index_import.argtypes = (
            [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
             ctypes.c_int32] + [ctypes.c_void_p] * 9
        )
        _lib = lib
    return _lib


def _as_np(ptr: int, shape, dtype):
    """Zero-copy view into C++-owned memory.

    LIFETIME CONTRACT: the view dangles after ldb_index_grow (realloc) or
    engine destruction — consumers must re-fetch the property after grow()
    and must not outlive the engine. Long-lived consumers (to_device on the
    CPU backend, where jnp.asarray can alias host memory) copy explicitly.
    """
    size = int(np.prod(shape))
    buf = (ctypes.c_char * (size * np.dtype(dtype).itemsize)).from_address(ptr)
    return np.frombuffer(buf, dtype=dtype).reshape(shape)


class NativeHnsw:
    """Multicore native HNSW index (duck-typed like HostHnsw)."""

    def __init__(self, params: HnswParams, capacity: int = 1024, seed: int = 0):
        self.p = params
        self.metric = Metric(params.metric)
        if self.metric == Metric.HAMMING:
            self.words = -(-params.dim // 32)
            self._vec_dtype = np.uint32
            self._vec_width = self.words
        else:
            self._vec_dtype = np.float32
            self._vec_width = params.dim
        self._cap = max(int(capacity), 8)
        self._lib = get_lib()
        self._h = self._lib.ldb_index_new(
            params.dim, self._vec_width, params.m, params.ef_construction,
            int(self.metric), self._cap, seed,
        )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.ldb_index_free(h)
            self._h = None

    # ---- stats ----
    def _stats(self):
        n = ctypes.c_int64()
        nu = ctypes.c_int64()
        entry = ctypes.c_int32()
        ml = ctypes.c_int32()
        cap = ctypes.c_int64()
        ucap = ctypes.c_int64()
        self._lib.ldb_index_stats(
            self._h, ctypes.byref(n), ctypes.byref(nu), ctypes.byref(entry),
            ctypes.byref(ml), ctypes.byref(cap), ctypes.byref(ucap),
        )
        return n.value, nu.value, entry.value, ml.value, cap.value, ucap.value

    @property
    def n(self):
        return self._stats()[0]

    @property
    def n_upper(self):
        return self._stats()[1]

    @property
    def entry(self):
        return self._stats()[2]

    @property
    def max_level(self):
        return self._stats()[3]

    # ---- array views (zero-copy; see _as_np lifetime contract) ----
    def _view(self, name, shape, dtype):
        ptr = getattr(self._lib, name)(self._h)
        return _as_np(ptr, shape, dtype)

    @property
    def vectors(self):
        _, _, _, _, cap, _ = self._stats()
        return self._view("ldb_index_vectors", (cap, self._vec_width), self._vec_dtype)

    @property
    def neighbors0(self):
        _, _, _, _, cap, _ = self._stats()
        return self._view("ldb_index_neighbors0", (cap, self.p.m0), np.int32)

    @property
    def counts0(self):
        _, _, _, _, cap, _ = self._stats()
        return self._view("ldb_index_counts0", (cap,), np.int32)

    @property
    def upper_neighbors(self):
        _, _, _, _, _, ucap = self._stats()
        return self._view("ldb_index_upper_neighbors", (ucap, LMAX, self.p.m), np.int32)

    @property
    def upper_counts(self):
        _, _, _, _, _, ucap = self._stats()
        return self._view("ldb_index_upper_counts", (ucap, LMAX), np.int32)

    @property
    def upper_slot(self):
        _, _, _, _, cap, _ = self._stats()
        return self._view("ldb_index_upper_slot", (cap,), np.int32)

    @property
    def levels(self):
        _, _, _, _, cap, _ = self._stats()
        return self._view("ldb_index_levels", (cap,), np.int32)

    @property
    def labels(self):
        _, _, _, _, cap, _ = self._stats()
        return self._view("ldb_index_labels", (cap,), np.uint64)

    @property
    def deleted(self):
        _, _, _, _, cap, _ = self._stats()
        return self._view("ldb_index_deleted", (cap,), np.uint8).astype(bool)

    # ---- operations ----
    def import_graph(self, graph, labels: np.ndarray | None = None):
        """Adopt a device-built graph (graph.build_device) as this engine's
        state — the reverse of to_device(). The TPU builder is 10-14x faster
        than this engine's sequential path, so the Index facade builds on
        device and imports here for host-side serving/persistence (the role
        StoreExternalIndex plays for the reference's external builds,
        external_index.c:240)."""
        import jax

        g = jax.device_get(graph)
        n = int(g.num_nodes)
        if n > self._cap:
            raise ValueError(f"graph has {n} nodes > capacity {self._cap}")
        # layout must match EXACTLY — the C import memcpys at the engine's
        # width/m0 strides, so a dim/m mismatch is a heap over-read plus a
        # silently garbled adjacency table, not an error
        g_width = g.vectors.shape[1]
        if g_width != self._vec_width:
            raise ValueError(
                f"graph vector width {g_width} != engine width "
                f"{self._vec_width} (dim/quant mismatch)"
            )
        if int(g.m) != self.p.m:
            raise ValueError(f"graph m={int(g.m)} != engine m={self.p.m}")
        if labels is not None and len(labels) < n:
            raise ValueError(f"{len(labels)} labels for {n} nodes")
        nb0 = np.ascontiguousarray(np.asarray(g.neighbors0[:n]), np.int32)
        up = np.asarray(g.upper_neighbors)
        slots = np.ascontiguousarray(np.asarray(g.upper_slot[:n]), np.int32)
        used = slots[slots >= 0]
        n_upper = int(used.max()) + 1 if used.size else 1
        if labels is None:
            from lantern_tpu.graph.device import join_labels

            labels = join_labels(np.asarray(g.labels[:n]))
        args = [
            np.ascontiguousarray(np.asarray(g.vectors[:n]), self._vec_dtype),
            nb0,
            np.ascontiguousarray((nb0 >= 0).sum(1).astype(np.int32)),
            np.ascontiguousarray(up[:n_upper], np.int32),
            np.ascontiguousarray((up[:n_upper] >= 0).sum(-1).astype(np.int32)),
            slots,
            np.ascontiguousarray(np.asarray(g.levels[:n]), np.int32),
            np.ascontiguousarray(labels, np.uint64),
            np.ascontiguousarray(np.asarray(g.deleted[:n]), np.uint8),
        ]
        rc = self._lib.ldb_index_import(
            self._h, n, n_upper, int(g.entry), int(g.max_level),
            *[a.ctypes.data_as(ctypes.c_void_p) for a in args],
        )
        if rc != 0:
            raise ValueError(self._lib.ldb_index_error(self._h).decode())

    def add(self, vecs: np.ndarray, labels: np.ndarray | None = None,
            nthreads: int = 0):
        vecs = np.ascontiguousarray(vecs, dtype=self._vec_dtype)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if vecs.shape[1] != self._vec_width:
            raise ValueError(
                f"vector width {vecs.shape[1]} != expected {self._vec_width}"
            )
        if labels is None:
            # pass NULL: the engine derives label = row id inside its
            # atomically reserved range, which stays correct when multiple
            # host threads add() concurrently (a python-side self.n read
            # here would race and mint duplicate labels)
            labels_ptr = None
        else:
            labels = np.ascontiguousarray(labels, np.uint64)
            if len(labels) != len(vecs):
                raise ValueError(
                    f"{len(labels)} labels for {len(vecs)} vectors"
                )
            labels_ptr = labels.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.ldb_index_add(
            self._h, len(vecs),
            vecs.ctypes.data_as(ctypes.c_void_p),
            labels_ptr,
            nthreads,
        )
        if rc < 0:
            raise MemoryError(self._lib.ldb_index_error(self._h).decode())
        return rc

    def search(self, q: np.ndarray, k: int, ef: int | None = None):
        ef = ef or self.p.ef
        q = np.ascontiguousarray(q, self._vec_dtype)
        out_ids = np.empty(max(k, ef), np.int32)
        out_d = np.empty(max(k, ef), np.float32)
        cnt = self._lib.ldb_index_search(
            self._h, q.ctypes.data_as(ctypes.c_void_p), k, ef,
            out_ids.ctypes.data_as(ctypes.c_void_p),
            out_d.ctypes.data_as(ctypes.c_void_p),
        )
        return out_ids[:cnt].copy(), out_d[:cnt].copy()

    def grow(self, new_cap: int) -> None:
        """Grow capacity in place (server.rs:243-247 doubling semantics).

        Must not run concurrently with add/search — callers are the serial
        ingest loops (index server / Index facade).
        """
        rc = self._lib.ldb_index_grow(self._h, int(new_cap))
        if rc != 0:
            raise MemoryError(self._lib.ldb_index_error(self._h).decode())
        self._cap = int(new_cap)

    def mark_deleted(self, labels: np.ndarray) -> int:
        labels = np.ascontiguousarray(labels, np.uint64)
        return self._lib.ldb_index_mark_deleted(
            self._h, labels.ctypes.data_as(ctypes.c_void_p), len(labels)
        )
