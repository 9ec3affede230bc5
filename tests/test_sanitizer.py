"""ASAN+UBSAN build of the native engine, exercised under concurrency —
parity with the reference's sanitizer CI
(.github/workflows/sanitizer-build-and-test.yaml, scripts/sanitizers/).

The sanitized .so must be loaded with libasan preloaded, so the exercise
runs in a subprocess; any sanitizer report fails the run (halt_on_error).
"""

import os
import subprocess
import sys

import pytest

_EXERCISE = r"""
import ctypes, os
import numpy as np
os.environ.setdefault("LANTERN_TPU_SANITIZE", "1")
import lantern_tpu.native as native

# route get_lib() through the sanitized build
native._lib = None
orig = native._build_lib
native._build_lib = lambda sanitize=True: orig(sanitize=True)

from lantern_tpu.config import HnswParams
from lantern_tpu.native import NativeHnsw

rng = np.random.default_rng(0)
p = HnswParams(dim=16, m=8, ef_construction=32)
ix = NativeHnsw(p, capacity=4000, seed=0)
base = rng.standard_normal((1500, 16)).astype(np.float32)

# concurrent inserts + searches + deletes (the spinlocked paths)
import threading
errs = []
def inserter(lo, hi):
    try:
        ix.add(base[lo:hi], labels=np.arange(lo, hi, dtype=np.uint64), nthreads=2)
    except Exception as e:
        errs.append(e)
def searcher():
    try:
        for i in range(60):
            ix.search(base[i % 200], k=5, ef=24)
    except Exception as e:
        errs.append(e)

ix.add(base[:300], nthreads=2)
ts = [threading.Thread(target=inserter, args=(300, 900)),
      threading.Thread(target=inserter, args=(900, 1500)),
      threading.Thread(target=searcher), threading.Thread(target=searcher)]
[t.start() for t in ts]; [t.join() for t in ts]
assert not errs, errs
assert ix.n == 1500
ix.mark_deleted(np.arange(10, dtype=np.uint64))
ix.grow(8000)
ix.add(rng.standard_normal((100, 16)).astype(np.float32),
       labels=np.arange(1500, 1600, dtype=np.uint64))
assert ix.n == 1600
ids, d = ix.search(base[42], k=3, ef=24)
assert ids[0] == 42
print("SANITIZED_RUN_OK")
"""


def _libasan_path() -> str | None:
    for compiler in ("g++", "gcc"):
        try:
            out = subprocess.run(
                [compiler, "-print-file-name=libasan.so"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
            if out and os.path.sep in out and os.path.exists(out):
                return out
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def test_native_engine_under_asan(tmp_path):
    libasan = _libasan_path()
    if libasan is None:
        pytest.skip("libasan not available")
    repo = os.path.dirname(os.path.dirname(__file__))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "LD_PRELOAD": libasan,
        # leak check would flag the python interpreter itself; UB/ASAN
        # errors still abort the process
        "ASAN_OPTIONS": "detect_leaks=0:halt_on_error=1:abort_on_error=1",
        "UBSAN_OPTIONS": "halt_on_error=1:print_stacktrace=1",
        "JAX_PLATFORMS": "cpu",
    }
    proc = subprocess.run(
        [sys.executable, "-c", _EXERCISE],
        env=env, capture_output=True, text=True, timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "SANITIZED_RUN_OK" in out
    assert "AddressSanitizer" not in out and "runtime error" not in out, out[-4000:]
