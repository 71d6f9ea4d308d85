"""bench.py driver-robustness tests (no device work — the measurement runs
in a child process; these exercise the retry wrapper that keeps a transient
axon-tunnel outage from turning the round's benchmark into a failure
artifact, the exact failure recorded in BENCH_r03.json)."""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


import io


class _Proc:
    def __init__(self, rc, out, err):
        self.returncode = rc
        self.stdout = io.StringIO(out)
        self.stderr = io.StringIO(err)

    def wait(self):
        return self.returncode

    def terminate(self):
        pass


def test_success_forwards_child_stdout(bench, monkeypatch, capsys):
    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: _Proc(0, '{"metric":"m","value":1}\n', ""))
    assert bench._main_with_retries() == 0
    assert capsys.readouterr().out == '{"metric":"m","value":1}\n'


def test_retries_transient_unavailable_then_succeeds(bench, monkeypatch, capsys):
    calls = []

    def fake_popen(*a, **k):
        calls.append(1)
        if len(calls) < 3:
            return _Proc(1, "", "RuntimeError: Unable to initialize backend "
                                "'axon': UNAVAILABLE")
        return _Proc(0, '{"metric":"m","value":2}\n', "")

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setenv("GN_BENCH_RETRIES", "4")
    monkeypatch.setenv("GN_BENCH_RETRY_WAIT", "0")
    assert bench._main_with_retries() == 0
    assert len(calls) == 3
    assert '{"metric":"m","value":2}' in capsys.readouterr().out


def test_nonretryable_failure_fails_fast(bench, monkeypatch):
    calls = []

    def fake_popen(*a, **k):
        calls.append(1)
        return _Proc(1, "", "ImportError: no such module")

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setenv("GN_BENCH_RETRIES", "4")
    monkeypatch.setenv("GN_BENCH_RETRY_WAIT", "0")
    assert bench._main_with_retries() == 1
    assert len(calls) == 1  # no pointless 25-min probe retries


def test_retry_budget_exhausts_with_child_rc(bench, monkeypatch):
    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: _Proc(7, "", "UNAVAILABLE"))
    monkeypatch.setenv("GN_BENCH_RETRIES", "2")
    monkeypatch.setenv("GN_BENCH_RETRY_WAIT", "0")
    assert bench._main_with_retries() == 7


def test_sigterm_stops_retry_loop(bench, monkeypatch):
    """A forwarded SIGTERM must end the loop — never spawn another TPU
    client after the supervisor asked the bench to die."""
    import signal as _signal

    calls = []

    class P(_Proc):
        def wait(self):
            os.kill(os.getpid(), _signal.SIGTERM)  # signal lands mid-run
            return self.returncode

    def fake_popen(*a, **k):
        calls.append(1)
        return P(-15, "", "UNAVAILABLE")

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setenv("GN_BENCH_RETRIES", "4")
    monkeypatch.setenv("GN_BENCH_RETRY_WAIT", "0")
    assert bench._main_with_retries() == -15
    assert len(calls) == 1


def test_hung_child_is_reaped_and_retried(bench, monkeypatch):
    """A child that produces NO output and never exits (observed: a client
    that never got past backend init after a tunnel stall) is reaped by the
    no-output watchdog after GN_BENCH_STALL_TIMEOUT and counted retryable —
    proc.wait() must not block the driver's bench forever."""
    import threading

    class _HangingProc:
        def __init__(self):
            self.returncode = None
            self.stdout = io.StringIO("")
            self.stderr = io.StringIO("")
            self._done = threading.Event()

        def poll(self):
            return self.returncode

        def wait(self):
            self._done.wait(timeout=30)
            return self.returncode

        def terminate(self):
            self.returncode = -15
            self._done.set()

    calls = []

    def fake_popen(*a, **k):
        calls.append(1)
        if len(calls) == 1:
            return _HangingProc()
        return _Proc(0, '{"metric":"m","value":3}\n', "")

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setenv("GN_BENCH_RETRIES", "3")
    monkeypatch.setenv("GN_BENCH_RETRY_WAIT", "0")
    monkeypatch.setenv("GN_BENCH_STALL_TIMEOUT", "0.2")
    assert bench._main_with_retries() == 0
    assert len(calls) == 2


def test_measure_mg_epoch_smoke(bench):
    """The multigraph-epoch metric's full wiring (assemble -> auto fns ->
    grouped batches -> whole-epoch jit) at toy scale on CPU; the TPU run
    only changes graph names/counts."""
    s, steps, kind = bench.measure_mg_epoch(
        repeats=1, dataset=os.path.join(bench.GRAPHS, "karate+dolphins"),
        counts=[4, 4], sims=20, batch_size=2)
    assert s > 0 and steps == 2 and kind in ("dense", "pallas2")
