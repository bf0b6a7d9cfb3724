"""Ring-sharded all-steps InfoNCE (SURVEY.md §6.7; VERDICT r1 #8): the
ppermute-ring sweep must equal the all-gather formulation and the
single-device global-batch computation — loss, accuracy, AND gradients —
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cpc_tpu.ops.infonce import infonce_loss_and_metrics, stacked_targets
from cpc_tpu.parallel.mesh import make_mesh

B_LOC, T, K, D = 2, 12, 3, 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    return make_mesh((len(jax.devices()),), ("data",))


def _data(n_dev, seed=0):
    rng = np.random.default_rng(seed)
    B = B_LOC * n_dev
    preds = jnp.asarray(rng.standard_normal((B, T, K, D)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    return preds, z


def test_ring_equals_global_all_steps(mesh):
    n_dev = mesh.size
    preds, z = _data(n_dev)

    loss_1, m1 = infonce_loss_and_metrics(preds, z, negatives="all_steps")

    def local(preds, z):
        loss, m = infonce_loss_and_metrics(
            preds, z, negatives="all_steps", axis_name="data", ring=True)
        return jax.lax.pmean(loss, "data"), jax.lax.pmean(m["acc"], "data")

    loss_r, acc_r = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False))(preds, z)
    np.testing.assert_allclose(float(loss_r), float(loss_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_r), np.asarray(m1["acc"]),
                               atol=1e-6)


def test_ring_equals_allgather_path(mesh):
    n_dev = mesh.size
    preds, z = _data(n_dev, seed=1)

    def run(ring):
        def local(preds, z):
            loss, _ = infonce_loss_and_metrics(
                preds, z, negatives="all_steps", axis_name="data", ring=ring)
            return jax.lax.pmean(loss, "data")
        return jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P(), check_vma=False))(preds, z)

    np.testing.assert_allclose(float(run(True)), float(run(False)),
                               rtol=1e-6)


def test_ring_gradients_equal_global(mesh):
    n_dev = mesh.size
    preds, z = _data(n_dev, seed=2)

    g1 = jax.grad(
        lambda p, z: infonce_loss_and_metrics(p, z, negatives="all_steps")[0],
        argnums=(0, 1))(preds, z)

    def local_grad(preds, z):
        return jax.grad(lambda p, zz: infonce_loss_and_metrics(
            p, zz, negatives="all_steps", axis_name="data", ring=True)[0],
            argnums=(0, 1))(preds, z)

    gp, gz = jax.jit(jax.shard_map(
        local_grad, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False))(preds, z)
    # Each replica's grad is of ITS local mean (1/R of the global rows), so
    # local grads are exactly R x the global-mean gradient: dp because only
    # replica r's rows touch p_r, dz because the homebound ring chunk
    # accumulates every replica's contribution (sum of local-mean grads).
    np.testing.assert_allclose(np.asarray(gp) / n_dev, np.asarray(g1[0]),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gz) / n_dev, np.asarray(g1[1]),
                               rtol=1e-5, atol=1e-8)


def test_ring_requires_all_steps(mesh):
    preds, z = _data(mesh.size)

    def local(preds, z):
        loss, _ = infonce_loss_and_metrics(
            preds, z, negatives="same_step", axis_name="data", ring=True)
        return loss

    with pytest.raises(ValueError, match="ring"):
        jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P(), check_vma=False))(preds, z)


def test_ring_train_step_runs(mesh):
    """End-to-end: a DP train step with ring all-steps negatives traces,
    runs, and produces a finite loss on the virtual mesh."""
    from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig,
                                EncoderConfig, LossConfig, ModelConfig,
                                TrainConfig)
    from cpc_tpu.data.loader import to_device
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.mesh import batch_sharding
    from cpc_tpu.train.train_step import init_state, make_step_fns

    n_dev = mesh.size
    cfg = CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                                  strides=(5, 4), d_enc=16),
            ar=ArConfig(d_ar=8),
            loss=LossConfig(prediction_steps=2, negatives="all_steps",
                            cross_replica=True, ring=True),
        ),
        data=DataConfig(batch_size=2 * n_dev, snippet_samples=1000),
        train=TrainConfig(seed=0),
    )
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model, mesh)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    batch = np.clip(np.random.default_rng(0).standard_normal(
        (cfg.data.batch_size, 1000)) * 8000, -32768, 32767).astype(np.int16)
    sharded = to_device(batch, batch_sharding(mesh))
    for _ in range(2):
        params, opt_state, metrics = steps.train_step(params, opt_state,
                                                      sharded)
    assert np.isfinite(float(metrics["loss"]))
