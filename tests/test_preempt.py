"""Clean-preemption protocol (benchmarks/preempt.py): the round-end bench
and entry() must be able to reclaim the exclusive axon chip claim from a
live canonical pipeline run without SIGKILL (which wedges the claim
host-side). Contract: create the STOP sentinel FIRST (the supervisor must
not relaunch into the new claim), SIGINT the pidfile's process (its
handler emits a partial artifact), wait for exit."""

import os
import signal
import subprocess
import time

import pytest

import benchmarks.preempt as preempt


@pytest.fixture
def sandbox(tmp_path, monkeypatch):
    pidfile = str(tmp_path / "p.pid")
    stopfile = str(tmp_path / "s.STOP")
    monkeypatch.setattr(preempt, "PIDFILE", pidfile)
    monkeypatch.setattr(preempt, "STOPFILE", stopfile)
    return pidfile, stopfile


def test_noop_without_pidfile(sandbox):
    pidfile, stopfile = sandbox
    assert preempt.preempt_canonical() is False
    assert not os.path.exists(stopfile)


def test_noop_on_stale_pidfile(sandbox):
    pidfile, stopfile = sandbox
    with open(pidfile, "w") as f:
        f.write("999999999")  # beyond pid_max
    assert preempt.preempt_canonical() is False
    assert not os.path.exists(stopfile)


def test_noop_on_garbage_pidfile(sandbox):
    pidfile, stopfile = sandbox
    with open(pidfile, "w") as f:
        f.write("not-a-pid")
    assert preempt.preempt_canonical() is False


def test_sigint_and_sentinel_on_live_process(sandbox):
    pidfile, stopfile = sandbox
    p = subprocess.Popen(["sleep", "600"])
    try:
        with open(pidfile, "w") as f:
            f.write(str(p.pid))
        t0 = time.time()
        assert preempt.preempt_canonical(timeout_s=30) is True
        assert time.time() - t0 < 25  # zombie-aware _alive: no stall
        assert os.path.exists(stopfile)  # sentinel created BEFORE the kill
        assert p.wait(timeout=5) == -signal.SIGINT
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()


def test_zombie_counts_as_dead(sandbox):
    pidfile, stopfile = sandbox
    p = subprocess.Popen(["true"])
    time.sleep(0.5)  # exited but unreaped: a zombie of this process
    try:
        with open(pidfile, "w") as f:
            f.write(str(p.pid))
        assert preempt._alive(p.pid) is False
        assert preempt.preempt_canonical() is False
    finally:
        p.wait()
