"""Multi-process (multi-host) DP rehearsal (SURVEY.md §6.8): 2 CPU
processes x 4 devices each must train the SAME SPMD program as one
process x 8 devices — identical logical mesh, Gloo collectives across the
process boundary — and produce the same loss trajectory. Also covers
cooperative checkpointing: a 2-process run resumed in fresh processes
continues the trajectory.

These tests spawn real subprocesses (jax.distributed coordinator +
workers), so they live outside the in-process jax session entirely; the
conftest platform flip does not apply to the children (tests/mh_driver.py
pins the CPU platform itself).
"""

import json
import os
import socket
import subprocess
import sys
import threading

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "mh_driver.py")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from cpc_tpu.data.synthetic import generate_synthetic_corpus
    root = str(tmp_path_factory.mktemp("mh_corpus"))
    generate_synthetic_corpus(root, num_speakers=4, files_per_speaker=2,
                              seconds_per_file=1.0, seed=7)
    return root


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(corpus, workdir, *, nprocs, devs_per_proc, steps, ckpt_every=1000,
         eval_every=None, resume=False, parallel="dp", device_corpus=False):
    """Launch `nprocs` driver processes; return pid-0's final JSON line."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU claim from children
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={devs_per_proc}")
    procs = []
    for pid in range(nprocs):
        cmd = [sys.executable, DRIVER, "--pid", str(pid),
               "--nprocs", str(nprocs), "--port", str(port),
               "--workdir", workdir, "--corpus", corpus,
               "--steps", str(steps), "--ckpt-every", str(ckpt_every),
               "--parallel", parallel]
        if eval_every is not None:
            cmd += ["--eval-every", str(eval_every)]
        if resume:
            cmd.append("--resume")
        if device_corpus:
            cmd.append("--device-corpus")
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    # drain every process's pipes CONCURRENTLY: sequential communicate()
    # leaves the other processes' pipes unserviced, and a full 64 KB pipe
    # blocks its writer (whose stalled collectives then hang the job)
    outs = [None] * len(procs)

    def _drain(i, p):
        outs[i] = p.communicate()

    threads = [threading.Thread(target=_drain, args=(i, p), daemon=True)
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    if any(t.is_alive() for t in threads):
        for p in procs:
            p.kill()
        for t in threads:
            t.join(timeout=30)
        raise AssertionError(f"multihost run timed out; partial: {outs}")
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"proc rc={p.returncode}\n{out}\n{err}"
    lines = [json.loads(l) for l in outs[0][0].strip().splitlines()
             if l.startswith("{")]
    return lines[-1]


def _losses(workdir, prefix="train"):
    out = {}
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == prefix and "loss" in rec:
                out[rec["step"]] = rec["loss"]
    return out


def test_two_process_matches_single_process(corpus, tmp_path):
    wd1 = str(tmp_path / "single")
    wd2 = str(tmp_path / "multi")

    done1 = _run(corpus, wd1, nprocs=1, devs_per_proc=8, steps=8,
                 eval_every=4)
    done2 = _run(corpus, wd2, nprocs=2, devs_per_proc=4, steps=8,
                 eval_every=4)
    assert done1["done"] == 8
    assert done2["done"] == 8 and done2["procs"] == 2 and done2["devices"] == 8

    l1, l2 = _losses(wd1), _losses(wd2)
    assert set(l1) == set(l2) and len(l1) == 8
    for step in sorted(l1):
        # same global batch, same SPMD program; only the collective
        # transport differs (XLA intra-process vs Gloo across), so allow
        # reduction-order noise but nothing more
        np.testing.assert_allclose(l2[step], l1[step], rtol=1e-5,
                                   err_msg=f"step {step}")
    # the validation pass shards its batches across processes too
    v1, v2 = _losses(wd1, "val"), _losses(wd2, "val")
    assert set(v1) == set(v2) == {4, 8}
    for step in v1:
        np.testing.assert_allclose(v2[step], v1[step], rtol=1e-5,
                                   err_msg=f"val step {step}")


def test_two_process_dpcp_matches_single_process(corpus, tmp_path):
    """2-D DP x CP across PROCESS boundaries: the 'data' axis spans two
    processes (each contributing its batch rows), the 'ctx' axis stays on
    each process's 4 local devices (the InfoNCE/attention rings never
    cross a process for their per-step hops... except the flattened
    InfoNCE ring, which does — and must still match). Loss trajectory ==
    the single-process (2, 4) run."""
    wd1 = str(tmp_path / "single")
    wd2 = str(tmp_path / "multi")
    done1 = _run(corpus, wd1, nprocs=1, devs_per_proc=8, steps=6,
                 parallel="dpcp")
    done2 = _run(corpus, wd2, nprocs=2, devs_per_proc=4, steps=6,
                 parallel="dpcp")
    assert done1["done"] == 6
    assert done2["done"] == 6 and done2["procs"] == 2

    l1, l2 = _losses(wd1), _losses(wd2)
    assert set(l1) == set(l2) and len(l1) == 6
    for step in sorted(l1):
        np.testing.assert_allclose(l2[step], l1[step], rtol=1e-5,
                                   err_msg=f"step {step}")


def test_two_process_device_corpus_matches_host_path(corpus, tmp_path):
    """The flagship long-run wire under the multi-process runtime
    (CLAUDE.md mandates device_corpus for long runs on this host): the
    int16 corpus is replicated into each process's devices and only the
    (B,) snippet-index vector crosses the host boundary, sharded over the
    global 'data' axis. Must reproduce the host-path loss trajectory —
    same batches, same math, only the staging wire differs."""
    wd_h = str(tmp_path / "host")
    wd_d = str(tmp_path / "devcorpus")
    done_h = _run(corpus, wd_h, nprocs=2, devs_per_proc=4, steps=6)
    done_d = _run(corpus, wd_d, nprocs=2, devs_per_proc=4, steps=6,
                  device_corpus=True)
    assert done_h["done"] == 6 and done_d["done"] == 6
    assert done_d["procs"] == 2 and done_d["devices"] == 8

    l_h, l_d = _losses(wd_h), _losses(wd_d)
    assert set(l_h) == set(l_d) and len(l_h) == 6
    for step in sorted(l_h):
        np.testing.assert_allclose(l_d[step], l_h[step], rtol=1e-5,
                                   err_msg=f"step {step}")


def test_two_process_checkpoint_resume(corpus, tmp_path):
    wd_ref = str(tmp_path / "straight")
    wd_res = str(tmp_path / "resumed")

    _run(corpus, wd_ref, nprocs=2, devs_per_proc=4, steps=10)

    # first leg: train to 5 with a checkpoint at 5, processes exit cleanly
    _run(corpus, wd_res, nprocs=2, devs_per_proc=4, steps=5, ckpt_every=5)
    # second leg: FRESH processes restore cooperatively and continue to 10
    done = _run(corpus, wd_res, nprocs=2, devs_per_proc=4, steps=10,
                ckpt_every=5, resume=True)
    assert done["resumed"] is True and done["done"] == 10

    l_ref, l_res = _losses(wd_ref), _losses(wd_res)
    for step in range(6, 11):
        np.testing.assert_allclose(l_res[step], l_ref[step], rtol=1e-5,
                                   err_msg=f"step {step}")
