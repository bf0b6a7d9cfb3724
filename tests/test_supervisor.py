"""Supervisor: failure DETECTION for crash/hang recovery (SURVEY.md §6.3).

The resume machinery is covered by test_fault_tolerance.py; these tests
cover the component that decides WHEN to restart: crash restarts, hang
(staleness) detection with SIGTERM→SIGKILL escalation, the consecutive
no-progress budget, and the CLI wiring. Stub children are plain Python
(no jax) so the policy tests run in seconds; one integration test
supervises a real Trainer child and SIGKILLs it mid-run."""

import json
import os
import signal
import subprocess
import sys
import threading
import time

import pytest

from cpc_tpu.train.supervisor import (
    SupervisedRun, latest_checkpoint_step, strip_supervisor_flags, supervise)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# behaviors: ok | crash | hang (ignores SIGTERM) | pcrash (new checkpoint,
# then crash). The supervisor appends --resume on restarts; the stub
# ignores it. Invocation count persists in the workdir.
_STUB = r"""
import os, signal, sys, time
wd = sys.argv[1]
behaviors = [a for a in sys.argv[2:] if a != "--resume"]
cf = os.path.join(wd, "invocations.txt")
n = int(open(cf).read()) if os.path.exists(cf) else 0
open(cf, "w").write(str(n + 1))
b = behaviors[min(n, len(behaviors) - 1)]
if b == "ok":
    open(os.path.join(wd, "metrics.jsonl"), "a").write('{"step": 999}\n')
    sys.exit(0)
if b == "crash":
    sys.exit(3)
if b == "hang":
    # one heartbeat, then wedge: ignore SIGTERM like a client blocked in C
    open(os.path.join(wd, "metrics.jsonl"), "a").write('{"step": 1}\n')
    signal.signal(signal.SIGTERM, signal.SIG_IGN)
    time.sleep(120)
    sys.exit(0)
if b == "pcrash":
    d = os.path.join(wd, "checkpoints", str((n + 1) * 5))
    os.makedirs(d, exist_ok=True)
    sys.exit(3)
raise SystemExit(f"unknown behavior {b}")
"""


def _stub_argv(wd, *behaviors):
    # -S skips site initialization: this host's sitecustomize imports jax
    # (~2 s of startup), which would eat into tight staleness windows; the
    # stub is pure stdlib and starts in ~10 ms without it
    return [sys.executable, "-S", "-c", _STUB, wd] + list(behaviors)


def _run(wd, behaviors, **kw):
    kw.setdefault("poll", 0.1)
    kw.setdefault("backoff", 0.05)
    kw.setdefault("term_grace", 1.0)
    kw.setdefault("log", lambda m: None)  # keep pytest output clean
    return supervise(_stub_argv(wd, *behaviors), wd, **kw)


def test_crash_then_ok(tmp_path):
    wd = str(tmp_path)
    res = _run(wd, ["crash", "ok"], max_restarts=3)
    assert res.exit_code == 0
    assert res.restarts == 1
    assert any("exit code 3" in e for e in res.events)
    # restarts carry --resume; the operator artifacts exist
    assert any("--resume" in e for e in res.events)
    assert os.path.exists(os.path.join(wd, "supervisor.log"))


def test_hang_detected_killed_resumed(tmp_path):
    """A child whose heartbeat goes stale is SIGTERMed; one that ignores
    SIGTERM (wedged in C) is SIGKILLed; either way the run resumes."""
    wd = str(tmp_path)
    t0 = time.time()
    res = _run(wd, ["hang", "ok"], stale_after=1.0, max_restarts=2)
    assert res.exit_code == 0
    assert res.restarts == 1
    assert any("STALE" in e for e in res.events)
    assert any("SIGKILL" in e for e in res.events)  # escalation happened
    assert time.time() - t0 < 30  # detected by staleness, not the sleep(120)


def test_budget_spent_on_repeated_no_progress_crash(tmp_path):
    res = _run(str(tmp_path), ["crash"], max_restarts=2)
    assert res.exit_code == 3
    assert res.restarts == 2
    assert any("budget spent" in e for e in res.events)


def test_progress_resets_budget(tmp_path):
    """Each attempt writes a NEW checkpoint before crashing: with
    max_restarts=1 the run still reaches the 4th attempt's 'ok' because
    progress resets the consecutive-failure count."""
    wd = str(tmp_path)
    res = _run(wd, ["pcrash", "pcrash", "pcrash", "ok"], max_restarts=1)
    assert res.exit_code == 0
    assert res.restarts == 3
    assert latest_checkpoint_step(wd) == 15


def test_strip_supervisor_flags():
    argv = ["--config=tpu_fast", "--supervise", "--stale-after", "600",
            "--max-restarts=2", "--workdir", "w", "--stale-after=90"]
    assert strip_supervisor_flags(argv) == [
        "--config=tpu_fast", "--workdir", "w"]


def test_cli_dispatch(tmp_path, monkeypatch):
    """--supervise routes to the supervisor with the child command equal to
    the same CLI invocation minus supervisor flags; it refuses to compose
    with --distributed."""
    from cpc_tpu.train import cli, supervisor

    seen = {}

    def fake(child_argv, workdir, **kw):
        seen["argv"], seen["wd"], seen["kw"] = list(child_argv), workdir, kw
        return SupervisedRun(0, 0, [])

    monkeypatch.setattr(supervisor, "supervise", fake)
    argv = ["--config=baseline", f"--workdir={tmp_path}", "--steps=1",
            "--supervise", "--stale-after=77", "--max-restarts=1"]
    assert cli.main(argv) == 0
    assert seen["argv"] == [sys.executable, "-m", "cpc_tpu.train",
                            "--config=baseline", f"--workdir={tmp_path}",
                            "--steps=1"]
    assert seen["wd"] == str(tmp_path)
    assert seen["kw"]["stale_after"] == 77.0
    assert seen["kw"]["max_restarts"] == 1

    with pytest.raises(SystemExit):
        cli.main(argv + ["--distributed"])


# real-training child (tiny config; mirrors test_fault_tolerance's script)
_TRAIN_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig, EncoderConfig,
                            LossConfig, ModelConfig, TrainConfig)
from cpc_tpu.data.dataset import SnippetDataset
from cpc_tpu.train.trainer import Trainer

cfg = CPCConfig(
    model=ModelConfig(
        encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                              strides=(5, 4), d_enc=16),
        ar=ArConfig(d_ar=8),
        loss=LossConfig(prediction_steps=2),
    ),
    data=DataConfig(batch_size=8, snippet_samples=2000, prefetch=1),
    train=TrainConfig(num_steps=40, log_every=1, eval_every=10**9,
                      checkpoint_every=5),
)
tr = Trainer(cfg, SnippetDataset({corpus!r}, 2000), workdir={workdir!r})
tr.maybe_resume()
tr.train()
tr.close()
"""


def test_supervised_training_survives_sigkill_integration(tmp_path):
    """End to end: supervise a REAL training child, SIGKILL it once a
    checkpoint exists, and verify the supervisor resumes it to completion."""
    from cpc_tpu.data.synthetic import generate_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    wd = str(tmp_path / "run")
    generate_synthetic_corpus(corpus, num_speakers=4, files_per_speaker=2,
                              seconds_per_file=1.0, seed=5)
    child = [sys.executable, "-c",
             _TRAIN_CHILD.format(repo=REPO, corpus=corpus, workdir=wd)]

    killed = {}

    def killer():
        deadline = time.time() + 300
        pid_path = os.path.join(wd, "supervisor_child.pid")
        while time.time() < deadline:
            if latest_checkpoint_step(wd) >= 5 and os.path.exists(pid_path):
                pid = int(open(pid_path).read())
                try:
                    os.kill(pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass  # child finished this attempt already
                killed["pid"] = pid
                return
            time.sleep(0.25)

    th = threading.Thread(target=killer, daemon=True)
    th.start()
    res = supervise(child, wd, stale_after=600, max_restarts=3, poll=0.25,
                    backoff=0.1, term_grace=5, log=lambda m: None)
    th.join(timeout=10)
    assert "pid" in killed, "killer never fired (no checkpoint appeared?)"
    assert res.exit_code == 0
    assert res.restarts >= 1
    # training actually completed: the metrics log reaches the final step
    steps = [json.loads(l)["step"]
             for l in open(os.path.join(wd, "metrics.jsonl"))
             if l.strip()]
    assert max(steps) == 40
    # and the resumed attempt CONTINUED rather than starting over: the step
    # sequence after the kill point never returns to 1 a second time
    assert steps.count(1) == 1


def test_signal_death_exit_code_mapping(tmp_path):
    """A child that dies by signal with no progress maps to the shell
    convention 128+sig, not a negative returncode that wraps to an
    arbitrary byte at process exit."""
    import sys

    from cpc_tpu.train.supervisor import supervise

    child = [sys.executable, "-c",
             "import os, signal; os.kill(os.getpid(), signal.SIGKILL)"]
    res = supervise(child, str(tmp_path), stale_after=60, max_restarts=0,
                    backoff=0.01, poll=0.05)
    assert res.exit_code == 137  # 128 + SIGKILL


def test_no_abbreviated_flags():
    """argparse abbreviations are OFF: '--superv' must error loudly, not
    parse as --supervise (which the supervisor's flag stripping would miss,
    forwarding it to the child and spawning supervisors recursively)."""
    import pytest

    from cpc_tpu.train.cli import build_argparser

    with pytest.raises(SystemExit):
        build_argparser().parse_args(["--superv", "--workdir", "/tmp/x"])
