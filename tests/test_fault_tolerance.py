"""Fault injection (SURVEY.md §6.3): kill a training process mid-run, resume
from the latest checkpoint in a fresh process, and verify the continuation is
exact. The reference loses progress since the last torch.save on any crash;
here resume-from-latest is idempotent and bitwise."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import os, sys, json
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
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
    train=TrainConfig(num_steps={steps}, log_every=1000, eval_every=10**9,
                      checkpoint_every=5),
)
ds = SnippetDataset({corpus!r}, 2000)
tr = Trainer(cfg, ds, workdir={workdir!r})
resumed = tr.maybe_resume()
print(json.dumps({{"resumed": resumed, "start_step": tr.step}}), flush=True)
tr.train()
tr.close()
import jax
leaves = jax.tree.leaves(tr.params)
print(json.dumps({{"final_step": tr.step,
                   "param_sum": float(sum(abs(np.asarray(l)).sum()
                                          for l in leaves))}}), flush=True)
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from cpc_tpu.data.synthetic import generate_synthetic_corpus
    root = str(tmp_path_factory.mktemp("ft_corpus"))
    generate_synthetic_corpus(root, num_speakers=4, files_per_speaker=2,
                              seconds_per_file=1.0, seed=5)
    return root


def _run(corpus, workdir, steps, kill_on_checkpoint=False):
    script = _SCRIPT.format(repo=REPO, corpus=corpus, workdir=workdir,
                            steps=steps)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU in the child
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, env=env, text=True)
    if kill_on_checkpoint:
        # SIGKILL as soon as at least one checkpoint lands (robust under a
        # loaded CI host, unlike a fixed sleep)
        ckpt_dir = os.path.join(workdir, "checkpoints")
        deadline = time.time() + 300
        while time.time() < deadline and proc.poll() is None:
            # count only finalized step dirs (orbax writes to a tmp name and
            # renames atomically on completion)
            steps_done = [d for d in (os.listdir(ckpt_dir)
                                      if os.path.isdir(ckpt_dir) else [])
                          if d.isdigit()]
            if steps_done:
                break
            time.sleep(0.5)
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        return None
    out, _ = proc.communicate(timeout=600)
    lines = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
    assert proc.returncode == 0, out
    return lines


def test_kill_and_resume_exact(corpus, tmp_path):
    wd_a = str(tmp_path / "a")   # uninterrupted run
    wd_b = str(tmp_path / "b")   # killed + resumed run

    ref = _run(corpus, wd_a, steps=20)
    assert ref[-1]["final_step"] == 20

    # start run B and SIGKILL it as soon as a checkpoint exists
    _run(corpus, wd_b, steps=20, kill_on_checkpoint=True)
    ckpt_dir = os.path.join(wd_b, "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir), (
        "no checkpoint was written before the kill")

    # resume in a fresh process; it must pick up from a checkpoint and land
    # on the identical final state (same data order, same optimizer state)
    res = _run(corpus, wd_b, steps=20)
    assert res[0]["resumed"] is True
    assert res[0]["start_step"] >= 5
    assert res[-1]["final_step"] == 20
    np.testing.assert_allclose(res[-1]["param_sum"], ref[-1]["param_sum"],
                               rtol=1e-6)


def test_sigterm_graceful_preemption(corpus, tmp_path):
    """SIGTERM (the TPU-pool preemption notice) must checkpoint at the
    CURRENT step — not the last periodic one — and exit cleanly; a resumed
    run continues from that exact step."""
    wd = str(tmp_path / "pre")
    # checkpoint_every=5 but we interrupt between periodic saves; use a
    # long run so the signal lands mid-training
    script = _SCRIPT.format(repo=REPO, corpus=corpus, workdir=wd, steps=5000)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, env=env, text=True)
    ckpt_dir = os.path.join(wd, "checkpoints")
    deadline = time.time() + 300
    while time.time() < deadline and proc.poll() is None:
        done = [d for d in (os.listdir(ckpt_dir)
                            if os.path.isdir(ckpt_dir) else [])
                if d.isdigit()]
        if done:
            break
        time.sleep(0.5)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out  # clean exit, not a crash
    lines = [json.loads(l) for l in out.strip().splitlines()
             if l.startswith("{")]
    stopped_at = lines[-1]["final_step"]
    assert 0 < stopped_at < 5000

    # the preemption checkpoint is at the stop step itself
    saved = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert stopped_at in saved, (stopped_at, saved)

    # resume picks up exactly there
    res = _run(corpus, wd, steps=stopped_at + 3)
    assert res[0]["resumed"] is True
    assert res[0]["start_step"] == stopped_at
    assert res[-1]["final_step"] == stopped_at + 3


def test_preempted_flag_resets_between_train_calls(corpus, tmp_path):
    """A SIGTERM during one train() call must not poison later calls on the
    same Trainer (the probe study trains milestone-by-milestone)."""
    from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig,
                                EncoderConfig, LossConfig, ModelConfig,
                                TrainConfig)
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
        train=TrainConfig(num_steps=100, log_every=1000, eval_every=10**9,
                          checkpoint_every=10**9),
    )
    tr = Trainer(cfg, SnippetDataset(corpus, 2000), workdir=None)
    tr.preempted = True  # as if a SIGTERM landed before/during a prior call
    tr.train(3)
    assert tr.step == 3 and tr.preempted is False
    tr.close()
