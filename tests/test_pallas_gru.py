"""Pallas GRU scan kernel parity (SURVEY.md §5.2): forward and gradients vs
the lax.scan reference, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.models.gru import GRU
from cpc_tpu.ops.gru_pallas import gru_scan


def _setup(B=4, T=9, D=8, H=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    gru = GRU(hidden_size=H)
    params = gru.init(jax.random.key(1), x)
    return gru, params, x


def _xproj(params, x):
    lp = params["params"]["layer0"]
    B, T, D = x.shape
    xp = (x.reshape(B * T, D) @ lp["wi"] + lp["bi"]).reshape(B, T, -1)
    return xp.transpose(1, 0, 2), lp  # (T, B, 3H)


def test_forward_matches_scan():
    gru, params, x = _setup()
    ref = gru.apply(params, x)
    xproj, lp = _xproj(params, x)
    h0 = jnp.zeros((x.shape[0], 8), jnp.float32)
    hs = gru_scan(xproj, lp["wh"], lp["bh"], h0, True)
    np.testing.assert_allclose(np.asarray(hs.transpose(1, 0, 2)),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_gradients_match_scan():
    gru, params, x = _setup(seed=3)
    H = 8

    def loss_ref(p, xx):
        out = gru.apply(p, xx)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    def loss_pal(p, xx):
        xproj, lp = _xproj(p, xx)
        h0 = jnp.zeros((xx.shape[0], H), jnp.float32)
        hs = gru_scan(xproj, lp["wh"], lp["bh"], h0, True)
        out = hs.transpose(1, 0, 2)
        return jnp.sum(out * jnp.cos(out))

    gr = jax.grad(loss_ref)(params, x)["params"]["layer0"]
    gp = jax.grad(loss_pal)(params, x)["params"]["layer0"]
    for k in ("wi", "bi", "wh", "bh"):
        np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gr[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)

    gxr = jax.grad(loss_ref, argnums=1)(params, x)
    gxp = jax.grad(loss_pal, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxr),
                               rtol=1e-5, atol=1e-6)


def test_module_flag_parity():
    _, params, x = _setup(seed=5)
    ref = GRU(hidden_size=8).apply(params, x)
    pal = GRU(hidden_size=8, use_pallas=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_nonzero_h0_and_longer_seq():
    rng = np.random.default_rng(7)
    B, T, H = 3, 17, 8
    xproj = jnp.asarray(rng.standard_normal((T, B, 3 * H)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((B, H)) * 0.5, jnp.float32)

    hs = gru_scan(xproj, wh, bh, h0, True)

    # literal loop oracle
    h = np.asarray(h0)
    for t in range(T):
        hp = h @ np.asarray(wh) + np.asarray(bh)
        xp = np.asarray(xproj[t])
        xr, xz, xn = np.split(xp, 3, 1)
        hr, hz, hn = np.split(hp, 3, 1)
        r = 1 / (1 + np.exp(-(xr + hr)))
        z = 1 / (1 + np.exp(-(xz + hz)))
        n = np.tanh(xn + r * hn)
        h = (1 - z) * n + z * h
        np.testing.assert_allclose(np.asarray(hs[t]), h, rtol=1e-5,
                                   atol=1e-6)


def test_unrolled_blocks_parity():
    # T=16 picks unroll factor > 1: exercises multi-step programs fwd+bwd
    from cpc_tpu.ops.gru_pallas import _unroll
    assert _unroll(16) > 1
    rng = np.random.default_rng(11)
    B, T, D, H = 4, 16, 8, 8
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    gru_ref = GRU(hidden_size=H)
    gru_pal = GRU(hidden_size=H, use_pallas=True)
    params = gru_ref.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(gru_pal.apply(params, x)),
        np.asarray(gru_ref.apply(params, x)), rtol=1e-6, atol=1e-6)

    def loss(m):
        def f(p, xx):
            out = m.apply(p, xx)
            return jnp.sum(out * jnp.sin(out))
        return f

    gr = jax.grad(loss(gru_ref), argnums=(0, 1))(params, x)
    gp = jax.grad(loss(gru_pal), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_multilayer_pallas_parity():
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    ref = GRU(hidden_size=8, num_layers=2)
    pal = GRU(hidden_size=8, num_layers=2, use_pallas=True)
    params = ref.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(pal.apply(params, x)),
                               np.asarray(ref.apply(params, x)),
                               rtol=1e-6, atol=1e-6)


def test_wide_hidden_parity():
    # H=512 is the dynamics-study width lever (--d-ar 512): pin the kernel
    # math at a hidden size twice the baseline before burning chip hours
    # on it. Tiny B/T keeps interpret-mode cost negligible.
    rng = np.random.default_rng(13)
    B, T, D, H = 2, 5, 8, 512
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    ref = GRU(hidden_size=H)
    pal = GRU(hidden_size=H, use_pallas=True)
    params = ref.init(jax.random.key(2), x)
    np.testing.assert_allclose(np.asarray(pal.apply(params, x)),
                               np.asarray(ref.apply(params, x)),
                               rtol=1e-5, atol=1e-5)

    def loss(m):
        def f(p, xx):
            out = m.apply(p, xx)
            return jnp.sum(out * jnp.sin(out))
        return f

    gr = jax.grad(loss(ref))(params, x)["params"]["layer0"]
    gp = jax.grad(loss(pal))(params, x)["params"]["layer0"]
    for k in ("wi", "bi", "wh", "bh"):
        np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gr[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
