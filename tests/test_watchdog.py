"""The watchdog/deadline shell protocol that keeps multi-hour chip runs
alive (benchmarks/watchdog.sh — docs/DESIGN.md "environment quirks": the
axon relay dies mid-run leaving a zero-CPU, silent-log wedge). These are
the behaviors review r4 found load-bearing and previously untested:

1. a STALENESS kill restarts the child even when it exits 0 (the Trainer
   handles SIGTERM gracefully — that must not read as "study finished");
2. the LOG.stop file makes the watchdog exit instead of restarting (the
   end-of-round chip handoff, deadline_guard.sh);
3. an untouched clean exit 0 ends the loop (real completion);
4. a crashing child is restarted up to MAX then the budget exhausts.

Runs with second-scale intervals via WD_TICK/WD_GRACE/WD_BACKOFF.
"""

import os
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(REPO, "benchmarks", "watchdog.sh")

pytestmark = pytest.mark.skipif(sys.platform != "linux",
                                reason="shell ops tooling is linux-only")


def _spawn(tmp_path, child_body, stale=3, max_restarts=2):
    """Start watchdog.sh around a generated child script; returns
    (process, log_path)."""
    child = tmp_path / "child.sh"
    child.write_text("#!/bin/bash\n" + textwrap.dedent(child_body))
    child.chmod(0o755)
    log = str(tmp_path / "run.log")
    env = dict(os.environ, WD_TICK="1", WD_GRACE="1", WD_BACKOFF="1")
    p = subprocess.Popen(["bash", WATCHDOG, log, str(stale),
                          str(max_restarts), "--", str(child)],
                         env=env, cwd=REPO)
    return p, log


def _wait(p, timeout):
    try:
        return p.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        p.kill()
        raise


def _wd_log(log):
    with open(log + ".wd") as f:
        return f.read()


def test_staleness_kill_restarts_despite_graceful_exit0(tmp_path):
    # child logs once then hangs silently; traps TERM -> exit 0 (the
    # Trainer's graceful-preemption shape). Watchdog must restart it
    # (self_killed overrides rc==0), then the stop file ends the loop.
    p, log = _spawn(tmp_path, """
        trap 'exit 0' TERM
        echo up
        sleep 600 & wait
        """)
    deadline = time.time() + 60
    while time.time() < deadline:
        if (os.path.exists(log + ".wd")
                and "restarting (1/2)" in _wd_log(log)):
            break
        time.sleep(0.5)
    else:
        p.kill()
        raise AssertionError(f"no restart: {_wd_log(log)}")
    wd = _wd_log(log)
    assert "self_killed=1" in wd and "child exited clean" not in wd
    open(log + ".stop", "w").close()
    assert _wait(p, 60) == 0
    assert "stop file present" in _wd_log(log)


def test_clean_exit_ends_loop(tmp_path):
    p, log = _spawn(tmp_path, "echo done-marker\n")
    assert _wait(p, 30) == 0
    assert "child exited clean" in _wd_log(log)
    assert "restarting" not in _wd_log(log)


def test_stop_file_prevents_any_spawn(tmp_path):
    log = str(tmp_path / "run.log")
    open(log + ".stop", "w").close()
    env = dict(os.environ, WD_TICK="1", WD_GRACE="1", WD_BACKOFF="1")
    p = subprocess.Popen(["bash", WATCHDOG, log, "3", "2", "--",
                          "/bin/true"], env=env, cwd=REPO)
    assert _wait(p, 30) == 0
    assert "stop file present — exiting" in _wd_log(log)
    assert not os.path.exists(log)  # the child never ran


def test_crash_restarts_then_budget_exhausts(tmp_path):
    # EX_TEMPFAIL is also what probe_study exits on graceful preemption —
    # the watchdog must treat any nonzero rc as "restart me"
    p, log = _spawn(tmp_path, "echo try; exit 75\n", max_restarts=2)
    assert _wait(p, 60) == 1
    wd = _wd_log(log)
    assert "restarting (1/2)" in wd and "restarting (2/2)" in wd
    assert "restart budget exhausted (rc=75)" in wd
    # the child really ran on every attempt
    with open(log) as f:
        assert f.read().count("try") == 3
