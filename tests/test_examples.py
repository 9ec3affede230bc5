"""Smoke-run the examples/ scripts (small sizes via EXAMPLE_N)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("script", ["quickstart.py", "pq_rerank.py",
                                    "sharded_mesh.py",
                                    "filters_and_maintenance.py"])
def test_example_runs(script):
    env = dict(os.environ, EXAMPLE_N="1200", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
