"""Fused conv pyramid parity (SURVEY.md §5.2): Pallas encoder == flax/XLA
ConvEncoder, forward and (recompute-vjp) gradients, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.config import EncoderConfig
from cpc_tpu.models.encoder import ConvEncoder
from cpc_tpu.ops.conv_pallas import plan


BASE = dict(channels=(32, 32, 48), kernels=(10, 8, 4), strides=(5, 4, 2),
            d_enc=48)


def _pair(tz=8, **kw):
    cfg_kw = dict(BASE)
    cfg_kw.update(kw)
    ref = ConvEncoder(EncoderConfig(**cfg_kw))
    pal = ConvEncoder(EncoderConfig(use_pallas=True, pallas_time_tile=tz,
                                    **cfg_kw))
    return ref, pal


def test_plan_arithmetic_baseline():
    p = plan((10, 8, 4, 4, 4), (5, 4, 2, 2, 2), 20480, 64)
    assert p["t_out"] == 128
    assert p["x_A"] == 160
    assert p["x_count"] == 160 * 64 + 305
    assert p["x_B"] == -152


def test_param_tree_identical():
    ref, pal = _pair()
    x = jnp.zeros((2, 1600))
    pr = ref.init(jax.random.key(0), x)
    pp = pal.init(jax.random.key(0), x)
    assert jax.tree.structure(pr) == jax.tree.structure(pp)
    for a, b in zip(jax.tree.leaves(pr), jax.tree.leaves(pp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("samples,tz", [(1600, 8), (3200, 40), (1600, 40)])
def test_forward_parity(samples, tz):
    ref, pal = _pair(tz=tz)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, samples)), jnp.float32)
    params = ref.init(jax.random.key(1), x)
    zr = ref.apply(params, x)
    zp = pal.apply(params, x)
    assert zp.shape == zr.shape
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zr),
                               rtol=1e-5, atol=1e-5)


def test_gradient_via_recompute_vjp():
    ref, pal = _pair()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    params = ref.init(jax.random.key(1), x)

    def loss(m):
        return lambda p, a: jnp.sum(m.apply(p, a) ** 2)

    gr = jax.grad(loss(ref))(params, x)
    gp = jax.grad(loss(pal))(params, x)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_full_baseline_spec_tiny_batch():
    # the real 5-layer 160x spec, small batch, fp32 interpret
    cfg = EncoderConfig()
    ref = ConvEncoder(cfg)
    pal = ConvEncoder(EncoderConfig(use_pallas=True, pallas_time_tile=32))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 20480)) * 0.1, jnp.float32)
    params = ref.init(jax.random.key(0), x)
    zr = ref.apply(params, x)
    zp = pal.apply(params, x)
    assert zp.shape == (1, 128, 512)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zr),
                               rtol=1e-4, atol=1e-4)


def test_unsupported_config_raises():
    pal = ConvEncoder(EncoderConfig(use_pallas=True, padding="VALID"))
    with pytest.raises(ValueError, match="SAME"):
        pal.init(jax.random.key(0), jnp.zeros((1, 1600)))
