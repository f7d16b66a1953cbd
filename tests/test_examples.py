"""The public examples stay runnable (subprocess smoke on the CPU mesh)."""

import pytest

pytestmark = pytest.mark.slow  # full-tier (pytest --full)

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, timeout: int = 1200) -> str:
    # Generous guard: this box has ONE CPU core and the example subprocess
    # contends with the rest of the suite; standalone it runs in ~90 s
    env = dict(os.environ)
    env.pop("NOVIC_MESH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_quickstart_example():
    out = _run("quickstart.py")
    assert "-->" in out  # classified predictions printed


def test_decoding_methods_example():
    out = _run("decoding_methods.py")
    assert "OK: greedy/beam/all gencfg grid" in out


def test_multichip_dp_example():
    out = _run("multichip_dp.py")
    assert "mesh: 8 x cpu" in out
    assert "OK: replicated-params DP train + batch-sharded beam serving" in out


def test_tp_serving_example():
    out = _run("tp_serving.py")
    assert "OK: tensor-parallel tower serving matches single-device numerics" in out


def test_serving_example():
    out = _run("serving.py")
    assert "Serving on http" in out
    assert "largest group" in out
    assert "Restarted model served 'all' decode from the store" in out
