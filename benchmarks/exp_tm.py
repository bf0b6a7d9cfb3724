"""A/B: time-major c into the fused loss (VERDICT r2 next #1a attack iii).

Old path: GRU emits (B, T, H) (internal transpose), fused loss transposes
back to (T, B, H). New path: CPCModel.latents_tm hands the scan's native
time-major output straight through. Same math (test_latents_tm_matches_
latents); this measures the full-jit step time of both, because standalone
layer benchmarks lie (docs/DESIGN.md).

Run on the chip: python benchmarks/exp_tm.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(step_fn, params, opt_state, batch, iters=400):
    for _ in range(5):
        params, opt_state, m = step_fn(params, opt_state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, m = step_fn(params, opt_state, batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from cpc_tpu.config import presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce_fused import fused_heads_infonce
    from cpc_tpu.train.train_step import init_state, make_step_fns, make_optimizer
    from cpc_tpu.data.loader import device_prepare

    cfg = presets.tpu_fast()
    model = CPCModel(cfg.model)
    steps_new = make_step_fns(cfg, model, None)  # current: latents_tm
    params, opt_state = init_state(cfg, model, steps_new.optimizer)
    opt = make_optimizer(cfg)

    def make_old_step():
        def loss_fn(params, batch):
            x = device_prepare(batch, normalize=cfg.data.normalize)
            z, c = model.apply(params, x, method=CPCModel.latents)
            W = params["params"]["prediction_heads"]["kernel"]
            return fused_heads_infonce(
                c, z, W, num_steps=cfg.model.loss.prediction_steps,
                compute_dtype=jnp.bfloat16, c_time_major=False)

        def train_step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics

        return jax.jit(train_step, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    batch = jax.device_put(np.clip(rng.standard_normal(
        (cfg.data.batch_size, cfg.data.snippet_samples)) * 6000,
        -32768, 32767).astype(np.int16))

    audio = cfg.data.batch_size * cfg.data.snippet_samples / cfg.data.sample_rate
    p0 = jax.tree.map(jnp.copy, params)
    o0 = jax.tree.map(jnp.copy, opt_state)
    ms_old = bench(make_old_step(), p0, o0, batch)
    ms_new = bench(steps_new.train_step, params, opt_state, batch)
    print(f"old (B,T,H)+transpose : {ms_old:7.3f} ms  "
          f"{audio/ms_old*1000:9.1f} audio-sec/s/chip", flush=True)
    print(f"new time-major        : {ms_new:7.3f} ms  "
          f"{audio/ms_new*1000:9.1f} audio-sec/s/chip", flush=True)
    print(f"delta: {ms_old - ms_new:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
