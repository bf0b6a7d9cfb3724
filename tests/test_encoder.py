"""Unit tests for genc (SURVEY.md §5.1): stride arithmetic, shapes, causality
of the 160x downsampling contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.config import EncoderConfig
from cpc_tpu.models.encoder import ConvEncoder, ScalogramEncoder


def test_conv_output_length_same_padding():
    # SURVEY.md §A: 20480 samples -> 128 latents at 160x downsampling.
    cfg = EncoderConfig()
    assert cfg.total_downsample == 160
    enc = ConvEncoder(cfg)
    x = jnp.zeros((2, 20480))
    params = enc.init(jax.random.key(0), x)
    z = enc.apply(params, x)
    assert z.shape == (2, 128, 512)


def test_conv_output_length_valid_padding():
    # torch-default zero padding: 20480 -> 126 latents.
    cfg = EncoderConfig(padding="VALID")
    enc = ConvEncoder(cfg)
    x = jnp.zeros((1, 20480))
    params = enc.init(jax.random.key(0), x)
    z = enc.apply(params, x)
    lengths = [20480]
    for k, s in zip(cfg.kernels, cfg.strides):
        lengths.append((lengths[-1] - k) // s + 1)
    assert z.shape == (1, lengths[-1], 512)
    assert z.shape[1] == 126


@pytest.mark.parametrize("samples", [20480, 20480 + 160, 40960])
def test_conv_downsample_scaling(samples):
    cfg = EncoderConfig()
    enc = ConvEncoder(cfg)
    x = jnp.zeros((1, samples))
    params = enc.init(jax.random.key(0), x)
    z = enc.apply(params, x)
    assert z.shape[1] == samples // 160


def test_conv_locality():
    # A latent at step t must not depend on samples far outside its
    # receptive field: perturb the tail, check early latents are unchanged.
    cfg = EncoderConfig()
    enc = ConvEncoder(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 20480)), dtype=jnp.float32)
    params = enc.init(jax.random.key(0), x)
    z1 = enc.apply(params, x)
    x2 = x.at[:, 19000:].set(0.0)
    z2 = enc.apply(params, x2)
    np.testing.assert_allclose(z1[:, :80], z2[:, :80], rtol=1e-6, atol=1e-6)


def test_scalogram_encoder_shapes():
    cfg = EncoderConfig(kind="scalogram", d_enc=512)
    enc = ScalogramEncoder(cfg)
    x = jnp.zeros((2, 20480))
    params = enc.init(jax.random.key(0), x)
    z = enc.apply(params, x)
    # hop=160, time strides all 1 -> same 128-latent contract as the conv path
    assert z.shape == (2, 128, 512)


def test_scalogram_encoder_cqt_scale():
    """scalogram_scale='cqt' routes the front-end through the true
    constant-Q bank and keeps the one-latent-per-hop contract."""
    cfg = EncoderConfig(kind="scalogram", d_enc=64,
                        scalogram_scale="cqt", scalogram_n_bins=48,
                        scalogram_fmin=65.4, scalogram_fmax=4000.0,
                        scalogram_channels=(8, 8),
                        scalogram_kernels=((3, 3), (3, 3)),
                        scalogram_freq_strides=(2, 2),
                        scalogram_time_strides=(1, 1))
    enc = ScalogramEncoder(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)),
                    jnp.float32)
    params = enc.init(jax.random.key(0), x)
    z = enc.apply(params, x)
    assert z.shape == (2, 50, 64)
    assert np.isfinite(np.asarray(z)).all()
    # gradients flow through the kernel-bank matmul
    g = jax.grad(lambda p: enc.apply(p, x).sum())(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_norm_options_all_live():
    """Every advertised norm value must change behavior or raise
    (VERDICT r1 #4: 'batch' used to be a silent no-op)."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3200)),
                    jnp.float32)
    outs = {}
    for norm in ("none", "layer", "group", "batch"):
        cfg = EncoderConfig(channels=(32, 32), kernels=(10, 8),
                            strides=(5, 4), d_enc=32, norm=norm)
        enc = ConvEncoder(cfg)
        params = enc.init(jax.random.key(0), x)
        outs[norm] = np.asarray(enc.apply(params, x))
        if norm != "none":
            names = str(jax.tree_util.tree_structure(params))
            assert "norm0" in names, f"{norm}: no norm params created"
    for norm in ("layer", "group", "batch"):
        assert not np.allclose(outs[norm], outs["none"]), norm

    with pytest.raises(ValueError, match="unknown encoder norm"):
        cfg = EncoderConfig(channels=(32,), kernels=(10,), strides=(5,),
                            d_enc=32, norm="spectral")
        ConvEncoder(cfg).init(jax.random.key(0), x)


def test_batch_norm_normalizes_channels():
    # after the norm (pre-activation it feeds), per-channel stats over
    # (batch, time) are ~N(0, 1) modulo the learned identity scale/bias
    from cpc_tpu.models.encoder import _BatchStatsNorm
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 100, 16))
                    * 5.0 + 3.0, jnp.float32)
    m = _BatchStatsNorm()
    params = m.init(jax.random.key(0), x)
    y = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(y.mean(axis=(0, 1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(0, 1)), 1.0, atol=1e-3)


def test_scalogram_encoder_norm_variants():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8000)),
                    jnp.float32)
    outs = {}
    for norm in ("none", "group", "batch"):
        cfg = EncoderConfig(kind="scalogram", d_enc=32,
                            scalogram_channels=(8, 8),
                            scalogram_kernels=((3, 3), (3, 3)),
                            scalogram_freq_strides=(2, 2),
                            scalogram_time_strides=(1, 1), norm=norm)
        enc = ScalogramEncoder(cfg)
        params = enc.init(jax.random.key(0), x)
        outs[norm] = np.asarray(enc.apply(params, x))
    assert not np.allclose(outs["group"], outs["none"])
    assert not np.allclose(outs["batch"], outs["none"])
