"""Profile + A/B the ALL-STEPS (study-regime) loss block (VERDICT r4 next
#3): the context-scaling / lever studies train with all_steps negatives at
long T, a regime that runs 10-17x slower than the same-step bench step and
had no dedicated perf pass. This script measures, on the chip:

  * the full train step at the exact study configs (run 7: 2.56 s, T=256,
    pool 16 384; run 4/5 families: 5.12 s, T=512, pool 32 768) -> au-s/s;
  * the ablation inside the SAME jit (standalone layer benches lie —
    CLAUDE.md): encoder+gar f+b alone, then + the all-steps loss;
  * the loss block in isolation on staged (preds, z): forward only and
    forward+backward — separating the streaming-softmax kernel's cost from
    the model's.

All timings: pipelined iters, ONE final host fetch (block_until_ready is a
no-op on axon — docs/DESIGN.md).

Run: python benchmarks/exp_allsteps.py [--config run7|run4|both]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, ms_guess=100.0):
    import jax
    iters = max(10, min(300, int(6000 / ms_guess)))
    out = None
    for _ in range(3):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


def study_cfg(snippet_samples: int, batch: int):
    from cpc_tpu.config import presets
    cfg = presets.tpu_fast()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, loss=dataclasses.replace(
                cfg.model.loss, negatives="all_steps")),
        data=dataclasses.replace(cfg.data, snippet_samples=snippet_samples,
                                 batch_size=batch, augment=True))


def profile_config(name: str, snippet: int, batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from cpc_tpu.data.loader import device_prepare
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.train.train_step import init_state, make_step_fns

    cfg = study_cfg(snippet, batch)
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model, mesh=None)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    rng = np.random.default_rng(0)
    batch_np = np.clip(rng.standard_normal(
        (batch, snippet)) * 6000, -32768, 32767).astype(np.int16)
    dbatch = jax.device_put(batch_np)
    key = jax.device_put(jax.random.key(1))

    out = {"config": name, "snippet": snippet, "batch": batch}
    audio_sec = batch * snippet / cfg.data.sample_rate

    # full train step (augment on, like the studies)
    t_step = timeit(lambda p, o, b, r: steps.train_step(p, o, b, r),
                    (params, opt_state, dbatch, key), ms_guess=300)
    out["train_step_ms"] = round(t_step, 2)
    out["audio_sec_per_sec"] = round(audio_sec / (t_step / 1000), 1)

    # model-only f+b (encoder + gar, no loss)
    def lat_loss(p, b):
        x = device_prepare(b, normalize=cfg.data.normalize)
        z, c = model.apply(p, x, method=CPCModel.latents)
        return jnp.sum(z.astype(jnp.float32) ** 2) + jnp.sum(
            c.astype(jnp.float32) ** 2)
    t_lat = timeit(jax.jit(jax.grad(lat_loss)), (params, dbatch),
                   ms_guess=50)
    out["model_fb_ms"] = round(t_lat, 2)

    # model + loss f+b (the step minus Adam/augment)
    def full_loss(p, b):
        x = device_prepare(b, normalize=cfg.data.normalize)
        o = model.apply(p, x)
        return infonce_loss_and_metrics(
            o.preds, o.z, negatives="all_steps",
            use_pallas=cfg.model.loss.use_pallas,
            pallas_bf16=cfg.model.loss.pallas_bf16)[0]
    t_full = timeit(jax.jit(jax.grad(full_loss)), (params, dbatch),
                    ms_guess=300)
    out["model_plus_loss_fb_ms"] = round(t_full, 2)
    out["loss_block_in_jit_ms"] = round(t_full - t_lat, 2)

    # loss block alone on staged preds/z (bf16 wire, as production)
    K = cfg.model.loss.prediction_steps
    T = snippet // 160
    D = cfg.model.encoder.d_enc
    preds = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, T, K, D)) * 0.1, jnp.bfloat16))
    z = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, T, D)) * 0.1, jnp.bfloat16))

    def loss_only(p_, z_):
        return infonce_loss_and_metrics(
            p_, z_, negatives="all_steps", use_pallas=True,
            pallas_bf16=True)[0]

    t_fwd = timeit(jax.jit(loss_only), (preds, z), ms_guess=80)
    out["loss_fwd_ms"] = round(t_fwd, 2)
    t_fb = timeit(jax.jit(jax.grad(loss_only, argnums=(0, 1))), (preds, z),
                  ms_guess=250)
    out["loss_fwdbwd_ms"] = round(t_fb, 2)

    # roofline context: score-pass FLOPs (fwd 1 pass, dP 2, dZ 2)
    Tp = T - K
    R, N = batch * Tp * K, batch * T
    out["score_tflop_per_pass"] = round(2 * R * N * D / 1e12, 2)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="both",
                    choices=["run7", "run4", "both"])
    args = ap.parse_args()
    todo = {"run7": [("run7_2.56s", 40960, 64)],
            "run4": [("run4_5.12s", 81920, 64)],
            "both": [("run7_2.56s", 40960, 64),
                     ("run4_5.12s", 81920, 64)]}[args.config]
    import jax
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for name, snippet, batch in todo:
        profile_config(name, snippet, batch)


if __name__ == "__main__":
    main()
