# lantern-tpu build/test targets — the L6 analog of the reference's
# CMake targets (reference: lantern_hnsw/CMakeLists.txt:336-354 `make test`,
# `make test-parallel`, `make cover`) and sanitizer scripts
# (lantern_hnsw/scripts/sanitizers/, .github/workflows/sanitizer-build-and-test.yaml).

PYTEST ?= python -m pytest
TESTS ?= tests/

.PHONY: test test-fast test-concurrency test-sanitizer cover bench native clean

test:
	$(PYTEST) $(TESTS) -x -q

# skip the slow device-build / multiprocess / sanitizer suites
test-fast:
	$(PYTEST) $(TESTS) -x -q --ignore=tests/test_build_device.py \
	  --ignore=tests/test_multiprocess.py --ignore=tests/test_sanitizer.py \
	  --ignore=tests/test_sharded.py

# the parallel-schedule analog (reference: test/parallel_schedule.txt)
test-concurrency:
	$(PYTEST) tests/test_concurrency.py -x -q

# ASAN+UBSAN build of the native engine + concurrency exercise
test-sanitizer:
	$(PYTEST) tests/test_sanitizer.py -x -q

# coverage over the package (reference: CMakeLists.txt:349-354 `make cover`)
cover:
	python -m coverage run -m pytest $(TESTS) -q && python -m coverage report \
	  --include='lantern_tpu/*' || \
	  $(PYTEST) $(TESTS) -q  # coverage not installed: plain run

bench:
	python bench.py

# compile the native engine into the hash-keyed cache (normally on import)
native:
	python -c "from lantern_tpu.native import _build_lib; print(_build_lib())"

clean:
	rm -rf build dist *.egg-info /tmp/lantern_tpu_native_* __pycache__
