"""Parity tests for the fused heads+InfoNCE kernel (ops/infonce_fused):
loss/accuracy and all three gradients (dc, dz, dW) vs the jnp reference
(SURVEY.md §5.2), plus cross-replica equality on the virtual 8-device mesh
(SURVEY.md §5.3)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.ops.infonce import infonce_loss_and_metrics
from cpc_tpu.ops.infonce_fused import fused_heads_infonce


def _setup(B=4, T=20, K=3, D=16, A=8, seed=0):
    rng = np.random.default_rng(seed)
    c = jnp.asarray(rng.standard_normal((B, T, A)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((A, K * D)) * 0.1, jnp.float32)
    return c, z, W, K


def _ref(c, z, W, K):
    B, T, A = c.shape
    D = z.shape[-1]
    preds = (c.reshape(B * T, A) @ W).reshape(B, T, K, D)
    return infonce_loss_and_metrics(preds, z, negatives="same_step")


def test_loss_and_acc_parity():
    c, z, W, K = _setup()
    l1, m1 = _ref(c, z, W, K)
    l2, m2 = fused_heads_infonce(c, z, W, num_steps=K, interpret=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m1["acc"]), np.asarray(m2["acc"]))


def test_gradients_parity():
    c, z, W, K = _setup(seed=1)
    g1 = jax.grad(lambda c, z, W: _ref(c, z, W, K)[0], argnums=(0, 1, 2))(c, z, W)
    g2 = jax.grad(lambda c, z, W: fused_heads_infonce(
        c, z, W, num_steps=K, interpret=True)[0], argnums=(0, 1, 2))(c, z, W)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_too_short_sequence_raises():
    c, z, W, K = _setup(T=3, K=3)
    with pytest.raises(ValueError, match="too short"):
        fused_heads_infonce(c, z, W, num_steps=K, interpret=True)


def test_cross_replica_equals_single_device():
    """shard_map fused loss with all-gathered negatives == single-device
    large-batch loss, and the pmean'd gradient == the full-batch gradient."""
    from jax.sharding import PartitionSpec as P
    from cpc_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    B_local, T, K, D, A = 2, 16, 2, 8, 4
    B = B_local * n_dev
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.standard_normal((B, T, A)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((A, K * D)) * 0.1, jnp.float32)
    mesh = make_mesh((n_dev,), ("data",))

    def local(c, z, W):
        loss, m = fused_heads_infonce(c, z, W, num_steps=K,
                                      axis_name="data", interpret=True)
        return jax.lax.pmean(loss, "data"), jax.lax.pmean(m["acc"], "data")

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data"), P()),
        out_specs=(P(), P()), check_vma=False))
    loss_dp, acc_dp = sharded(c, z, W)
    loss_1, m1 = fused_heads_infonce(c, z, W, num_steps=K, interpret=True)
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_dp), np.asarray(m1["acc"]),
                               atol=1e-6)

    def dp_grad(c, z, W):
        # the dp.py convention: grad of the LOCAL loss, then pmean the grads
        g = jax.grad(lambda W: fused_heads_infonce(
            c, z, W, num_steps=K, axis_name="data", interpret=True)[0])(W)
        return jax.lax.pmean(g, "data")

    gW_dp = jax.jit(jax.shard_map(
        dp_grad, mesh=mesh, in_specs=(P("data"), P("data"), P()),
        out_specs=P(), check_vma=False))(c, z, W)
    gW_1 = jax.grad(lambda W: fused_heads_infonce(
        c, z, W, num_steps=K, interpret=True)[0])(W)
    np.testing.assert_allclose(np.asarray(gW_dp), np.asarray(gW_1),
                               rtol=1e-5, atol=1e-7)


def test_train_step_fused_matches_unfused():
    """The fuse_heads train step computes the same loss/metrics as the jnp
    path at fp32 on the first step."""
    from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig,
                                EncoderConfig, LossConfig, ModelConfig,
                                TrainConfig)
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.mesh import make_mesh
    from cpc_tpu.train.train_step import init_state, make_step_fns

    def cfg_with(fuse):
        return CPCConfig(
            model=ModelConfig(
                encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                                      strides=(5, 4), d_enc=16),
                ar=ArConfig(d_ar=8),
                loss=LossConfig(prediction_steps=2, use_pallas=fuse,
                                fuse_heads=fuse),
            ),
            data=DataConfig(batch_size=4, snippet_samples=2000),
            train=TrainConfig(seed=0),
        )

    batch = np.clip(np.random.default_rng(0).standard_normal(
        (4, 2000)) * 8000, -32768, 32767).astype(np.int16)
    mesh = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    results = []
    for fuse in (False, True):
        cfg = cfg_with(fuse)
        model = CPCModel(cfg.model)
        steps = make_step_fns(cfg, model, mesh)
        params, opt_state = init_state(cfg, model, steps.optimizer)
        params, opt_state, metrics = steps.train_step(
            params, opt_state, jnp.asarray(batch))
        results.append((float(metrics["loss"]), np.asarray(metrics["acc"]),
                        jax.tree.leaves(params)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)
    for a, b in zip(results[0][2], results[1][2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
