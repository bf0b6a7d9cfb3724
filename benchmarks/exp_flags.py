"""XLA scheduling-flag sweep on the headline (tpu_fast) step (VERDICT r4
next #5a): XLA_FLAGS must be set before backend init, so each combo runs in
a fresh subprocess that times the full bf16 batch-64 train step (pipelined
iters, one scalar fetch). Prints one JSON line per combo; flags XLA rejects
are recorded as errors rather than killing the sweep.

Run on the chip: python benchmarks/exp_flags.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "aggressive_fusion": "--xla_tpu_rwb_fusion=true",
    "scheduler_rerun": "--xla_latency_hiding_scheduler_rerun=3",
}


def child():
    import jax

    from cpc_tpu.config import presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.train_step import init_state, make_step_fns

    cfg = presets.tpu_fast()
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model, mesh=None)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    rng = np.random.default_rng(0)
    batch = jax.device_put(np.clip(rng.standard_normal(
        (cfg.data.batch_size, cfg.data.snippet_samples)) * 6000,
        -32768, 32767).astype(np.int16))
    p_, o_, m_ = params, opt_state, None
    for _ in range(5):
        p_, o_, m_ = steps.train_step(p_, o_, batch)
    float(np.asarray(m_["loss"]))
    iters = 400
    t0 = time.perf_counter()
    for _ in range(iters):
        p_, o_, m_ = steps.train_step(p_, o_, batch)
    float(np.asarray(m_["loss"]))
    ms = (time.perf_counter() - t0) / iters * 1000
    audio = cfg.data.batch_size * cfg.data.snippet_samples / 16000
    print(json.dumps({"step_ms": round(ms, 3),
                      "audio_sec_per_sec": round(audio / (ms / 1000), 1)}),
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child()
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, flags in COMBOS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, cwd=repo, text=True, capture_output=True, timeout=900)
        row = {"combo": name, "flags": flags,
               "wall_s": round(time.time() - t0, 1)}
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            row.update(json.loads(lines[-1]))
        else:
            row["error"] = (proc.stderr.strip().splitlines() or ["?"])[-1][:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
