"""Optimizer/trainer features: LR schedules, gradient clipping, gradient
accumulation. Accumulation must be EXACTLY the mean of per-microbatch
grads fed to one optimizer update (each microbatch is its own InfoNCE
negative pool — the documented semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig, EncoderConfig,
                            LossConfig, ModelConfig, TrainConfig)
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.train.train_step import (init_state, make_optimizer,
                                      make_step_fns)


def _cfg(**train_kw):
    return CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                                  strides=(5, 4), d_enc=16),
            ar=ArConfig(d_ar=8),
            loss=LossConfig(prediction_steps=2)),
        data=DataConfig(batch_size=8, snippet_samples=1200),
        train=TrainConfig(**train_kw))


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((cfg.data.batch_size,
                             cfg.data.snippet_samples)).astype(np.float32)
    return jnp.asarray(np.clip(np.round(x * 8000), -32768, 32767)
                       .astype(np.int16))


def test_cosine_schedule_decays_update():
    cfg = _cfg(lr_schedule="cosine", num_steps=6, learning_rate=1e-2)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    g = {"w": jnp.ones((3,))}
    sizes = []
    for _ in range(6):
        upd, state = opt.update(g, state, params)
        sizes.append(float(jnp.abs(upd["w"]).max()))
    # constant grads: Adam's normalized magnitude tracks the lr schedule —
    # monotone cosine decay, an order of magnitude down by the last step
    # (the schedule is read at the pre-increment count, so it lands near
    # but not exactly at 0)
    assert all(a > b for a, b in zip(sizes, sizes[1:])), sizes
    assert sizes[-1] < 0.1 * sizes[0], sizes


def test_grad_clip_wiring():
    """The configured optimizer must equal chain(clip_by_global_norm,
    adam) exactly, and diverge from unclipped adam once a spike has
    entered the moment estimates (Adam's FIRST step is scale-invariant
    for uniform grads, so only later steps can tell them apart)."""
    clip = make_optimizer(_cfg(grad_clip_norm=1e-2))
    base = make_optimizer(_cfg())
    t = _cfg().train
    ref = optax.chain(optax.clip_by_global_norm(1e-2),
                      optax.adam(t.learning_rate, b1=t.beta1, b2=t.beta2))
    params = {"w": jnp.ones((4,))}
    grads = [{"w": jnp.full((4,), 1e4)}, {"w": jnp.full((4,), 1.0)}]
    s_clip, s_ref, s_base = (o.init(params) for o in (clip, ref, base))
    for i, g in enumerate(grads):
        u_clip, s_clip = clip.update(g, s_clip, params)
        u_ref, s_ref = ref.update(g, s_ref, params)
        u_base, s_base = base.update(g, s_base, params)
        np.testing.assert_array_equal(np.asarray(u_clip["w"]),
                                      np.asarray(u_ref["w"]))
        if i > 0:
            assert not np.allclose(np.asarray(u_clip["w"]),
                                   np.asarray(u_base["w"]))


def test_unknown_lr_schedule_raises():
    with pytest.raises(ValueError, match="lr_schedule"):
        make_optimizer(_cfg(lr_schedule="linear"))
    with pytest.raises(ValueError, match="accum_steps"):
        make_step_fns(_cfg(accum_steps=0), CPCModel(_cfg().model))


def test_accum_equals_mean_of_microbatch_grads():
    cfg1 = _cfg()
    cfg2 = _cfg(accum_steps=2)
    model = CPCModel(cfg1.model)
    steps1 = make_step_fns(cfg1, model)
    steps2 = make_step_fns(cfg2, model)
    params, opt_state = init_state(cfg1, model, steps1.optimizer)
    batch = _batch(cfg1)

    # manual: grads of the two half-batches, averaged, one Adam update
    # (computed BEFORE train_step — its donate_argnums invalidates params)
    grads, losses = [], []
    for mb in (batch[:4], batch[4:]):
        (loss, _), g = jax.value_and_grad(steps1.loss_fn, has_aux=True)(
            params, mb)
        grads.append(g)
        losses.append(float(loss))
    gm = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
    upd, _ = steps1.optimizer.update(gm, steps1.optimizer.init(params),
                                     params)
    p_manual = optax.apply_updates(params, upd)
    norm_manual = float(optax.global_norm(gm))

    p2, _, m2 = steps2.train_step(params, opt_state, batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        p2, p_manual)
    np.testing.assert_allclose(float(m2["loss"]), np.mean(losses), rtol=1e-6)
    np.testing.assert_allclose(float(m2["grad_norm"]), norm_manual,
                               rtol=1e-5)


def test_accum_with_augment_rng_runs():
    cfg = _cfg(accum_steps=2)
    cfg = dataclasses.replace(cfg,
                              data=dataclasses.replace(cfg.data,
                                                       augment=True))
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    p, s, m = steps.train_step(params, opt_state, _batch(cfg),
                               jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_accum_indivisible_batch_raises():
    cfg = _cfg(accum_steps=3)  # batch 8 % 3 != 0
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    with pytest.raises(ValueError, match="divisible"):
        steps.train_step(params, opt_state, _batch(cfg))


def test_accum_under_dp_mesh():
    """accum composes with shard_map DP: local batch 2, two microbatches
    of 1 per replica; runs and produces finite loss + moving params."""
    from cpc_tpu.parallel.mesh import batch_sharding, make_mesh
    cfg = dataclasses.replace(
        _cfg(accum_steps=2),
        data=dataclasses.replace(_cfg().data, batch_size=16))
    model = CPCModel(cfg.model)
    mesh = make_mesh((8,), ("data",))
    steps = make_step_fns(cfg, model, mesh)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    batch = jax.device_put(_batch(cfg), batch_sharding(mesh))
    p, s, m = steps.train_step(params, opt_state, batch)
    assert np.isfinite(float(m["loss"]))
