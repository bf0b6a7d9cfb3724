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

    # full train step (augment on, like the studies). The step donates
    # params/opt_state, so the timing loop must THREAD the state instead of
    # reusing the original (donated) buffers.
    p_, o_, m_ = params, opt_state, None
    for _ in range(3):
        p_, o_, m_ = steps.train_step(p_, o_, dbatch, key)
    float(np.asarray(m_["loss"]))
    iters = max(10, min(300, int(6000 / 300)))
    t0 = time.perf_counter()
    for _ in range(iters):
        p_, o_, m_ = steps.train_step(p_, o_, dbatch, key)
    float(np.asarray(m_["loss"]))
    t_step = (time.perf_counter() - t0) / iters * 1000
    params, opt_state = p_, o_  # donated originals are gone
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

    # reduce the grads to a scalar INSIDE the jit: timeit fetches its first
    # output leaf, and dpreds is (B, T, K, D) — fetching it through the
    # axon tunnel would add hundreds of ms of pure transfer (the same
    # artifact the sweep path fixed)
    def fb_scalar(p_, z_):
        dp, dz = jax.grad(loss_only, argnums=(0, 1))(p_, z_)
        return (jnp.sum(dp.astype(jnp.float32))
                + jnp.sum(dz.astype(jnp.float32)))
    t_fb = timeit(jax.jit(fb_scalar), (preds, z), ms_guess=250)
    out["loss_fwdbwd_ms"] = round(t_fb, 2)

    # roofline context: score-pass FLOPs (fwd 1 pass, dP 2, dZ 2)
    Tp = T - K
    R, N = batch * Tp * K, batch * T
    out["score_tflop_per_pass"] = round(2 * R * N * D / 1e12, 2)
    print(json.dumps(out), flush=True)
    return out


def sweep(snippet: int, batch: int):
    """A/B the kernel knobs (tile sizes, bf16 grad wire) on the isolated
    loss block at the given study shape. Each trial re-jits under fresh
    closures so the env knobs are re-read at trace time. Outputs are
    reduced to scalars INSIDE the jit — fetching the (B, T, K, D) dpreds
    through the axon tunnel would swamp the timing (the 1974 ms artifact
    in the first baseline run)."""
    import jax
    import jax.numpy as jnp

    from cpc_tpu.ops.infonce import infonce_loss_and_metrics

    rng = np.random.default_rng(0)
    K, D = 12, 512
    T = snippet // 160
    preds = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, T, K, D)) * 0.1, jnp.bfloat16))
    z = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, T, D)) * 0.1, jnp.bfloat16))

    def trial(rt, ct, gb16):
        os.environ["CPC_ALLSTEPS_RT"] = str(rt)
        os.environ["CPC_ALLSTEPS_CT"] = str(ct)
        os.environ["CPC_ALLSTEPS_GRAD_BF16"] = str(int(gb16))

        def loss_only(p_, z_):
            return infonce_loss_and_metrics(
                p_, z_, negatives="all_steps", use_pallas=True,
                pallas_bf16=True)[0]

        def fb_scalar(p_, z_):
            dp, dz = jax.grad(loss_only, argnums=(0, 1))(p_, z_)
            return (jnp.sum(dp.astype(jnp.float32))
                    + jnp.sum(dz.astype(jnp.float32)))

        row = {"rt": rt, "ct": ct, "grad_bf16": gb16}
        try:
            row["fwd_ms"] = round(timeit(jax.jit(loss_only), (preds, z),
                                         ms_guess=60), 2)
            row["fwdbwd_ms"] = round(timeit(jax.jit(fb_scalar), (preds, z),
                                            ms_guess=200), 2)
        except Exception as e:  # compile envelope: record, keep sweeping
            row["error"] = str(e)[:200]
        print(json.dumps(row), flush=True)

    base_gb = False
    for rt, ct in ((256, 512), (512, 512), (512, 1024), (256, 1024),
                   (1024, 512), (512, 2048), (1024, 1024)):
        trial(rt, ct, base_gb)
    trial(512, 1024, True)
    trial(256, 512, True)
    for v in ("CPC_ALLSTEPS_RT", "CPC_ALLSTEPS_CT",
              "CPC_ALLSTEPS_GRAD_BF16"):
        os.environ.pop(v, None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="both",
                    choices=["run7", "run4", "both"])
    ap.add_argument("--sweep", action="store_true",
                    help="A/B tile/bf16 knobs on the isolated loss block")
    args = ap.parse_args()
    todo = {"run7": [("run7_2.56s", 40960, 64)],
            "run4": [("run4_5.12s", 81920, 64)],
            "both": [("run7_2.56s", 40960, 64),
                     ("run4_5.12s", 81920, 64)]}[args.config]
    import jax
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    if args.sweep:
        name, snippet, batch = todo[0]
        print(json.dumps({"sweep_at": name}), flush=True)
        sweep(snippet, batch)
        return
    for name, snippet, batch in todo:
        profile_config(name, snippet, batch)


if __name__ == "__main__":
    main()
