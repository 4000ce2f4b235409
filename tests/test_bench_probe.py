"""bench.py's TPU probe: retry behavior around wedged-claim windows.

A single-shot probe misclassified a healthy chip as absent in round 1
and silently recorded a CPU-fallback benchmark (BENCH_r01.json); the
probe now retries.  These tests drive `tpu_available` with stubbed
subprocesses — no TPU or real probe process involved.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


class _FakeProc:
    def __init__(self, script):
        """script: list of ('ok'|'fail'|'hang') outcomes, one per
        communicate() call."""
        self._script = list(script)
        self.returncode = None

    def communicate(self, timeout=None):
        import subprocess

        outcome = self._script.pop(0) if self._script else "hang"
        if outcome == "ok":
            self.returncode = 0
            return "ok 64.0", ""
        if outcome == "fail":
            self.returncode = 1
            return "", ""
        raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)

    def kill(self):
        self.returncode = -9


def test_probe_immediate_success(bench, monkeypatch):
    import subprocess

    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: _FakeProc(["ok"]))
    assert bench.tpu_available(attempts=3, timeout_s=1) is True


def test_probe_retries_through_transient_failure(bench, monkeypatch):
    """Attempt 1 fails (wedged claim), attempt 2 succeeds."""
    import subprocess

    scripts = [["fail"], ["ok"]]
    monkeypatch.setattr(
        subprocess, "Popen", lambda *a, **k: _FakeProc(scripts.pop(0)))
    assert bench.tpu_available(attempts=3, timeout_s=1) is True


def test_probe_waits_out_a_hang_then_succeeds(bench, monkeypatch):
    """First grace period times out, the extended wait succeeds —
    the hung probe is NOT killed (killing wedges the claim)."""
    import subprocess

    procs = []

    def popen(*a, **k):
        p = _FakeProc(["hang", "ok"])
        procs.append(p)
        return p

    monkeypatch.setattr(subprocess, "Popen", popen)
    assert bench.tpu_available(attempts=1, timeout_s=1) is True
    assert procs[0].returncode == 0  # finished, never killed


def test_probe_gives_up_after_all_attempts(bench, monkeypatch):
    import subprocess

    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: _FakeProc(["fail"]))
    assert bench.tpu_available(attempts=2, timeout_s=1) is False


def test_bench_latency_parse_args():
    import importlib
    import pytest

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        bl = importlib.import_module("bench_latency")
    finally:
        sys.path.remove(os.path.join(REPO, "scripts"))

    assert bl.parse_args([]) == ([1, 8, 32, 128], "bfloat16")
    assert bl.parse_args(["1", "8"]) == ([1, 8], "bfloat16")
    # both --dtype forms; short names normalized
    assert bl.parse_args(["4", "--dtype=f32"]) == ([4], "float32")
    assert bl.parse_args(["--dtype", "bf16", "2"]) == ([2], "bfloat16")
    assert bl.parse_args(["--dtype=int8"])[1] == "int8"
    # unknown dtype is an error, never a silent f32 run
    with pytest.raises(SystemExit):
        bl.parse_args(["--dtype=float16"])


def test_bench_infer_class_rejects_unknown_dtype(monkeypatch):
    import importlib
    import pytest

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        bic = importlib.import_module("bench_infer_class")
    finally:
        sys.path.remove(os.path.join(REPO, "scripts"))
    monkeypatch.setenv("BENCH_DTYPE", "float16")
    with pytest.raises(SystemExit):
        bic.build("cnn")


def test_bench_normalize_dtype(bench):
    assert bench.normalize_dtype("bf16") == "bfloat16"
    assert bench.normalize_dtype("BFLOAT16") == "bfloat16"
    assert bench.normalize_dtype("f32") == "float32"
    assert bench.normalize_dtype("int8") == "int8"
    with pytest.raises(SystemExit):
        bench.normalize_dtype("float16")
