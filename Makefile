# lantern-tpu build/test targets — the L6 analog of the reference's
# CMake targets (reference: lantern_hnsw/CMakeLists.txt:336-354 `make test`,
# `make test-parallel`, `make cover`) and sanitizer scripts
# (lantern_hnsw/scripts/sanitizers/, .github/workflows/sanitizer-build-and-test.yaml).

PYTEST ?= python -m pytest
TESTS ?= tests/

# Test schedule (the reference's test/schedule.txt analog): three balanced
# shards, each run in its OWN pytest process. Why processes: (a) CI fans
# the shards out as matrix jobs; (b) XLA:CPU compiles segfault RARELY but
# nonzero-often in long single-process runs (r4: one crash mid-suite in
# backend_compile_and_load that did not reproduce in isolation) — process
# isolation bounds the blast radius; (c) wall time is compile-bound, and
# shards were balanced from measured per-file durations (r4).
SHARD1 = tests/test_build_device.py tests/test_graph.py tests/test_golden.py \
  tests/test_distance.py tests/test_native.py tests/test_streaming.py \
  tests/test_text.py
SHARD2 = tests/test_sharded.py tests/test_sharded_quant.py \
  tests/test_concurrency.py tests/test_multiprocess.py
SHARD3 = tests/test_recall_golden.py tests/test_ecosystem.py \
  tests/test_examples.py tests/test_quant.py tests/test_flat.py \
  tests/test_pallas.py tests/test_service.py tests/test_storage.py \
  tests/test_replica.py tests/test_sanitizer.py \
  tests/test_concurrent_reindex.py

.PHONY: test test-shard1 test-shard2 test-shard3 test-fast test-concurrency \
  test-sanitizer cover bench native clean

test: test-schedule-check test-shard1 test-shard2 test-shard3

# a new tests/test_*.py not in any shard would silently drop from `make
# test` — fail loudly instead (schedule.txt drift guard)
test-schedule-check:
	@ls tests/test_*.py | sort > /tmp/.lantern_all_tests; \
	echo $(SHARD1) $(SHARD2) $(SHARD3) | tr ' ' '\n' | sort \
	  > /tmp/.lantern_sched_tests; \
	diff -u /tmp/.lantern_all_tests /tmp/.lantern_sched_tests \
	  || { echo "Makefile test schedule is missing test files"; exit 1; }

test-shard1:
	$(PYTEST) $(SHARD1) -x -q

test-shard2:
	$(PYTEST) $(SHARD2) -x -q

test-shard3:
	$(PYTEST) $(SHARD3) -x -q

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
