"""Rematerialization knobs (encoder.remat / ar.remat): checkpointed training
must be numerically IDENTICAL to the unchecked path — same param tree, same
values, same gradients — because remat only changes WHEN activations exist,
never what is computed (SURVEY.md §8 TPU-first design: trade HBM for FLOPs
via jax.checkpoint; the knob exists for the long-context regime where the
first conv layer's (B, T/5, 512) activations dominate memory)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.config import ArConfig, EncoderConfig, LossConfig, ModelConfig
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.ops.infonce import infonce_loss_and_metrics


def _x(samples=800, B=2, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((B, samples)),
        jnp.float32)


def _loss_fn(model, x, rngs=None):
    def f(params):
        out = model.apply(params, x, train=rngs is not None, rngs=rngs)
        return infonce_loss_and_metrics(out.preds, out.z)[0]
    return f


def _assert_grads_equal(cfg_plain: ModelConfig, cfg_remat: ModelConfig,
                        x, rngs=None, rtol=1e-6, atol=1e-7):
    m0, m1 = CPCModel(cfg_plain), CPCModel(cfg_remat)
    init_rng = jax.random.key(0)
    p0 = m0.init(init_rng, x)
    p1 = m1.init(init_rng, x)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1)), (
        "remat must not change the parameter tree (checkpoint compat)")
    l0, l1 = _loss_fn(m0, x, rngs), _loss_fn(m1, x, rngs)
    np.testing.assert_allclose(float(l1(p0)), float(l0(p0)),
                               rtol=rtol, atol=atol)
    g0 = jax.grad(l0)(p0)
    g1 = jax.grad(l1)(p0)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=rtol, atol=atol)
    return m1, p0, l1


def _conv_cfg(norm="none", remat=False, **kw):
    defaults = dict(
        encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                              strides=(5, 4), d_enc=16, norm=norm,
                              remat=remat),
        ar=ArConfig(d_ar=16),
        loss=LossConfig(prediction_steps=3))
    defaults.update(kw)
    return ModelConfig(**defaults)


@pytest.mark.parametrize("norm", ["none", "layer", "batch"])
def test_conv_encoder_remat_matches(norm):
    _assert_grads_equal(_conv_cfg(norm=norm), _conv_cfg(norm=norm,
                                                        remat=True), _x())


def test_encoder_remat_actually_checkpoints():
    """The knob must DO something: the grad jaxpr of the remat model carries
    remat regions; the plain model's carries none."""
    x = _x()
    for remat, expect in ((False, False), (True, True)):
        m = CPCModel(_conv_cfg(remat=remat))
        p = m.init(jax.random.key(0), x)
        jaxpr = str(jax.make_jaxpr(jax.grad(_loss_fn(m, x)))(p))
        assert ("remat" in jaxpr or "checkpoint" in jaxpr) is expect, (
            f"remat={remat}: expected checkpoint-in-jaxpr={expect}")


def test_scalogram_encoder_remat_matches():
    def cfg(remat):
        return ModelConfig(
            encoder=EncoderConfig(
                kind="scalogram", d_enc=16, remat=remat,
                scalogram_n_fft=128, scalogram_hop=40, scalogram_n_bins=16,
                scalogram_channels=(8, 16), scalogram_kernels=((3, 3),) * 2,
                scalogram_freq_strides=(2, 2),
                scalogram_time_strides=(1, 1)),
            ar=ArConfig(d_ar=16), loss=LossConfig(prediction_steps=2))
    _assert_grads_equal(cfg(False), cfg(True), _x(1600), rtol=1e-5,
                        atol=1e-6)


def test_transformer_remat_matches_with_dropout():
    """ar.remat under live dropout: the dropout rng must thread identically
    through the checkpointed blocks (flax lifts the rng into the remat
    region), so train-mode values and grads match bit-for-bit semantics."""
    base = _conv_cfg()
    _assert_grads_equal(
        dataclasses.replace(base, ar=ArConfig(
            kind="transformer", d_ar=16, num_layers=2, num_heads=2,
            dropout=0.3)),
        dataclasses.replace(base, ar=ArConfig(
            kind="transformer", d_ar=16, num_layers=2, num_heads=2,
            dropout=0.3, remat=True)),
        _x(), rngs={"dropout": jax.random.key(7)})


def test_transformer_remat_flash_kernel():
    """ar.remat wrapped around the Pallas flash-attention kernel: the
    custom-VJP op must recompute correctly inside the checkpointed block
    (remat replays the kernel's forward, then runs its saved-lse backward).
    Grads must equal the UN-checkpointed flash path bit-for-bit semantics."""
    base = _conv_cfg()
    tf = ArConfig(kind="transformer", d_ar=16, num_layers=2, num_heads=2,
                  attn_impl="flash")
    _assert_grads_equal(
        dataclasses.replace(base, ar=tf),
        dataclasses.replace(base, ar=dataclasses.replace(tf, remat=True)),
        _x(), rtol=1e-5, atol=1e-6)


def test_both_remats_compose():
    base = _conv_cfg()
    tf = ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2)
    _assert_grads_equal(
        dataclasses.replace(base, ar=tf),
        dataclasses.replace(
            base,
            encoder=dataclasses.replace(base.encoder, remat=True),
            ar=dataclasses.replace(tf, remat=True)),
        _x())


def test_gru_remat_raises():
    cfg = _conv_cfg(ar=ArConfig(kind="gru", d_ar=16, remat=True))
    with pytest.raises(ValueError, match="transformer gar"):
        CPCModel(cfg).init(jax.random.key(0), _x())


def test_pallas_encoder_remat_raises():
    cfg = _conv_cfg()
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
        cfg.encoder, use_pallas=True, remat=True))
    with pytest.raises(ValueError, match="fused Pallas pyramid"):
        CPCModel(cfg).init(jax.random.key(0), _x())


@pytest.mark.parametrize("impl", ["ring", "zigzag"])
def test_cp_remat_equals_single_device(impl):
    """encoder.remat + ar.remat inside the context-parallel shard_map path:
    halo-exchange ppermutes and ring/zig-zag-attention collectives (incl.
    zigzag's relayout ppermutes) are replayed in the remat recompute;
    values and parameter grads still equal the plain single-device
    forward."""
    from cpc_tpu.parallel.cp import cp_cpc_loss_from_audio
    from cpc_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((-1,), ("ctx",))
    T = 8 * 8
    base = ModelConfig(
        encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                              strides=(2, 2), d_enc=16),
        ar=ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2,
                    max_len=T),
        loss=LossConfig(prediction_steps=3, negatives="all_steps"))
    remat = dataclasses.replace(
        base,
        encoder=dataclasses.replace(base.encoder, remat=True),
        ar=dataclasses.replace(base.ar, remat=True, attn_impl=impl))
    model = CPCModel(base)
    x = _x(T * 4, seed=7)
    params = model.init(jax.random.key(2), x)

    def ref_loss(p):
        out = model.apply(p, x)
        return infonce_loss_and_metrics(out.preds, out.z,
                                        negatives="all_steps")[0]

    def cp_loss(p):
        return cp_cpc_loss_from_audio(remat, p, x, mesh=mesh)[0]

    np.testing.assert_allclose(float(cp_loss(params)),
                               float(ref_loss(params)), rtol=1e-5, atol=1e-6)
    flat_r = jax.tree_util.tree_leaves(jax.grad(ref_loss)(params))
    flat_c = jax.tree_util.tree_leaves(jax.grad(cp_loss)(params))
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)
