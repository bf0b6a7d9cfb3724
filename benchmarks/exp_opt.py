"""What's inside the 0.63 ms opt+metrics tail of the train step?

Variants of the full tpu_fast train step: with/without grad_norm, with/
without per-k accuracy metrics, Adam vs SGD (bounds the Adam cost).
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from cpc_tpu.config import presets
    from cpc_tpu.data.loader import device_prepare
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce_fused import fused_heads_infonce
    from cpc_tpu.train.train_step import init_state, make_optimizer

    cfg = presets.tpu_fast()
    model = CPCModel(cfg.model)
    K = cfg.model.loss.prediction_steps
    kdtype = (jnp.bfloat16 if cfg.model.loss.pallas_bf16
              else jnp.float32)

    def loss_fn(p, b):
        x = device_prepare(b, normalize=cfg.data.normalize)
        z, c = model.apply(p, x, method=CPCModel.latents)
        W = p["params"]["prediction_heads"]["kernel"]
        return fused_heads_infonce(c, z, W, num_steps=K,
                                   compute_dtype=kdtype)

    def make_step(opt, grad_norm=True, full_metrics=True):
        def step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if not full_metrics:
                metrics = {"loss": metrics["loss"]}
            else:
                metrics = dict(metrics)
            if grad_norm:
                metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics
        return jax.jit(step, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    batch = jax.device_put(np.clip(rng.standard_normal(
        (cfg.data.batch_size, cfg.data.snippet_samples)) * 6000,
        -32768, 32767).astype(np.int16))

    adam = make_optimizer(cfg)
    sgd = optax.sgd(2e-4)
    variants = [
        ("adam + grad_norm + acc (current)", adam, True, True),
        ("adam + acc, no grad_norm       ", adam, False, True),
        ("adam, loss-only metrics        ", adam, False, False),
        ("sgd,  loss-only metrics        ", sgd, False, False),
    ]
    for name, opt, gn, fm in variants:
        step = make_step(opt, gn, fm)
        params, opt_state = init_state(cfg, model, opt)
        for _ in range(3):
            params, opt_state, m = step(params, opt_state, batch)
        float(m["loss"])
        iters = 300
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, m = step(params, opt_state, batch)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name}: {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
