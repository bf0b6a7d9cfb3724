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
