"""Step-time ablation: cumulative jit timings for the tpu_fast train step.

Each stage adds one component; consecutive differences are the component
costs INSIDE the full jit (standalone layer benchmarks lie — CLAUDE.md).
All timings: pipelined iters, one final host fetch (block_until_ready is a
no-op on axon).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=300):
    import jax
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


def main():
    import jax
    import jax.numpy as jnp

    from cpc_tpu.config import presets
    from cpc_tpu.data.loader import device_prepare
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce_fused import fused_heads_infonce
    from cpc_tpu.parallel.mesh import make_mesh
    from cpc_tpu.train.train_step import init_state, make_step_fns

    cfg = presets.tpu_fast()
    model = CPCModel(cfg.model)
    mesh = make_mesh((-1,), ("data",))
    steps = make_step_fns(cfg, model, mesh)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    rng = np.random.default_rng(0)
    batch = jax.device_put(np.clip(rng.standard_normal(
        (cfg.data.batch_size, cfg.data.snippet_samples)) * 6000,
        -32768, 32767).astype(np.int16))
    K = cfg.model.loss.prediction_steps
    kdtype = jnp.bfloat16 if cfg.model.loss.pallas_bf16 else jnp.float32

    # 1. encoder fwd+bwd only
    def enc_loss(p, b):
        x = device_prepare(b, normalize=cfg.data.normalize)
        z = model.apply(p, x, method=CPCModel.encode)
        return jnp.sum(z.astype(jnp.float32) ** 2)
    enc_fb = jax.jit(jax.grad(enc_loss))
    t_enc = timeit(enc_fb, (params, batch))
    print(f"encoder f+b              : {t_enc:7.2f} ms", flush=True)

    # 2. + GRU
    def lat_loss(p, b):
        x = device_prepare(b, normalize=cfg.data.normalize)
        z, c = model.apply(p, x, method=CPCModel.latents)
        return jnp.sum(z.astype(jnp.float32) ** 2) + jnp.sum(
            c.astype(jnp.float32) ** 2)
    lat_fb = jax.jit(jax.grad(lat_loss))
    t_lat = timeit(lat_fb, (params, batch))
    print(f"+ gru f+b                : {t_lat:7.2f} ms  (gru {t_lat-t_enc:5.2f})",
          flush=True)

    # 3. + fused heads+InfoNCE (full loss grad, no optimizer)
    def full_loss(p, b):
        x = device_prepare(b, normalize=cfg.data.normalize)
        z, c = model.apply(p, x, method=CPCModel.latents)
        W = p["params"]["prediction_heads"]["kernel"]
        loss, _ = fused_heads_infonce(c, z, W, num_steps=K,
                                      compute_dtype=kdtype)
        return loss
    loss_fb = jax.jit(jax.grad(full_loss))
    t_loss = timeit(loss_fb, (params, batch))
    print(f"+ fused loss f+b         : {t_loss:7.2f} ms  (loss {t_loss-t_lat:5.2f})",
          flush=True)

    # 4. full train step (Adam + metrics + grad_norm). train_step donates
    # (params, opt_state) so the loop must rebind them each iteration.
    for _ in range(3):
        params, opt_state, m = steps.train_step(params, opt_state, batch)
    float(m["loss"])
    iters = 300
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, m = steps.train_step(params, opt_state, batch)
    float(m["loss"])
    t_full = (time.perf_counter() - t0) / iters * 1000
    print(f"full step                : {t_full:7.2f} ms  (opt+metrics "
          f"{t_full-t_loss:5.2f})", flush=True)


if __name__ == "__main__":
    main()
