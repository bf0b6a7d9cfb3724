"""Parity for the causal flash-attention kernel (ops/attention_pallas.py)
and its transformer-gar wiring (SURVEY.md §5.2 kernel-parity strategy).

Runs in interpret mode on CPU (conftest flips the platform); the same
assertions are driven compiled on the real chip during development.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.config import ArConfig
from cpc_tpu.models.transformer import CausalTransformer
from cpc_tpu.ops.attention_pallas import flash_causal_mha
from tests.oracles import ref_causal_mha as _ref_causal_mha, qkv as _base_qkv


def _qkv(T, B=2, H=2, Dh=16, seed=0):
    return _base_qkv(T, B=B, H=H, Dh=Dh, seed=seed)


@pytest.mark.parametrize("T", [24, 100, 128, 200, 300])
def test_flash_forward_matches_reference(T):
    # T spans: single-tile (8-aligned and not), exactly one 128 tile,
    # multi-tile with a ragged tail
    q, k, v = _qkv(T)
    got = flash_causal_mha(q, k, v)
    want = _ref_causal_mha(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T", [100, 200])
def test_flash_gradients_match_reference(T):
    q, k, v = _qkv(T, seed=1)
    w = jnp.asarray(np.random.default_rng(2).standard_normal(q.shape),
                    jnp.float32)  # non-uniform cotangent

    def f_flash(q, k, v):
        return jnp.sum(flash_causal_mha(q, k, v) * w)

    def f_ref(q, k, v):
        return jnp.sum(_ref_causal_mha(q, k, v) * w)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5,
                                   err_msg=f"d{name}")


def _tf(attn_impl, T=64):
    cfg = ArConfig(kind="transformer", d_ar=32, num_layers=2, num_heads=4,
                   max_len=max(T, 64), attn_impl=attn_impl)
    return CausalTransformer(cfg)


def test_module_flash_equals_xla_same_params():
    """Same parameter tree, same output — the impl knob changes only the
    kernel, so a checkpoint moves freely between the two."""
    T = 72
    z = jnp.asarray(np.random.default_rng(3).standard_normal((2, T, 24)),
                    jnp.float32)
    m_xla, m_flash = _tf("xla", T), _tf("flash", T)
    params = m_xla.init(jax.random.PRNGKey(0), z)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                m_flash.init(jax.random.PRNGKey(0), z)))
    np.testing.assert_allclose(m_flash.apply(params, z),
                               m_xla.apply(params, z),
                               rtol=3e-5, atol=3e-5)


def test_module_flash_param_grads_match_xla():
    T = 40
    z = jnp.asarray(np.random.default_rng(4).standard_normal((2, T, 24)),
                    jnp.float32)
    m_xla, m_flash = _tf("xla", T), _tf("flash", T)
    params = m_xla.init(jax.random.PRNGKey(1), z)

    def loss(m):
        return lambda p: jnp.sum(jnp.tanh(m.apply(p, z)))

    g_x = jax.grad(loss(m_xla))(params)
    g_f = jax.grad(loss(m_flash))(params)
    flat_x, _ = jax.tree_util.tree_flatten(g_x)
    flat_f, _ = jax.tree_util.tree_flatten(g_f)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


def test_flash_path_is_causal():
    T = 48
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((1, T, 24)), jnp.float32)
    m = _tf("flash", T)
    params = m.init(jax.random.PRNGKey(2), z)
    out = m.apply(params, z)
    z2 = z.at[:, 30:].set(jnp.asarray(rng.standard_normal((1, T - 30, 24)),
                                      jnp.float32))
    out2 = m.apply(params, z2)
    np.testing.assert_allclose(out[:, :30], out2[:, :30],
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(out[:, 30:], out2[:, 30:])


def test_attn_impl_validation():
    z = jnp.zeros((1, 8, 24), jnp.float32)
    with pytest.raises(ValueError, match="attn_impl"):
        _tf("fused").init(jax.random.PRNGKey(0), z)
    bad = ArConfig(kind="transformer", d_ar=32, num_heads=4, dropout=0.1,
                   attn_impl="flash")
    with pytest.raises(ValueError, match="dropout"):
        CausalTransformer(bad).init(jax.random.PRNGKey(0), z)


# --- flash16: bf16-fed post-softmax matmuls (ar.attn_impl='flash16') ------

def test_flash16_forward_close_to_reference():
    """p_dtype='bfloat16' rounds only the 5 post-softmax matmul inputs;
    softmax statistics stay fp32, so the error is bf16 rounding (~8 mantissa
    bits), not a drift."""
    q, k, v = _qkv(200, seed=6)
    got = flash_causal_mha(q, k, v, p_dtype="bfloat16")
    want = _ref_causal_mha(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash16_gradients_close_to_reference():
    q, k, v = _qkv(100, seed=7)
    w = jnp.asarray(np.random.default_rng(8).standard_normal(q.shape),
                    jnp.float32)

    def f16(q, k, v):
        return jnp.sum(flash_causal_mha(q, k, v, p_dtype="bfloat16") * w)

    def f_ref(q, k, v):
        return jnp.sum(_ref_causal_mha(q, k, v) * w)

    g16 = jax.grad(f16, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g16, g_ref, "qkv"):
        np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2,
                                   err_msg=f"d{name}")


def test_module_flash16_same_tree_close_output():
    """flash16 shares the exact flax param tree (checkpoints move freely);
    outputs agree to bf16 rounding."""
    T = 72
    z = jnp.asarray(np.random.default_rng(9).standard_normal((2, T, 24)),
                    jnp.float32)
    m_xla, m_16 = _tf("xla", T), _tf("flash16", T)
    params = m_xla.init(jax.random.PRNGKey(0), z)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                m_16.init(jax.random.PRNGKey(0), z)))
    np.testing.assert_allclose(m_16.apply(params, z),
                               m_xla.apply(params, z),
                               rtol=4e-2, atol=4e-2)


def test_flash16_dropout_validation():
    z = jnp.zeros((1, 8, 24), jnp.float32)
    bad = ArConfig(kind="transformer", d_ar=32, num_heads=4, dropout=0.1,
                   attn_impl="flash16")
    with pytest.raises(ValueError, match="dropout"):
        CausalTransformer(bad).init(jax.random.PRNGKey(0), z)
