"""Kernel parity tests (SURVEY.md §5.2): Pallas fused InfoNCE == jnp
reference, forward values AND gradients, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.ops.infonce import infonce_loss_and_metrics
from cpc_tpu.ops.infonce_pallas import fused_infonce


def _data(B=4, T=16, K=3, D=8, C=None, seed=0):
    C = C or B
    rng = np.random.default_rng(seed)
    preds = rng.standard_normal((B, T, K, D)).astype(np.float32)
    z = rng.standard_normal((C, T, D)).astype(np.float32)
    return jnp.asarray(preds), jnp.asarray(z)


@pytest.mark.parametrize("shape", [(4, 16, 3, 8), (3, 10, 4, 16), (8, 20, 12, 8)])
def test_forward_parity(shape):
    B, T, K, D = shape
    preds, z = _data(B, T, K, D)
    Tp = T - K
    loss_ref, m_ref = infonce_loss_and_metrics(preds, z, negatives="same_step")
    loss_pal, m_pal = fused_infonce(preds[:, :Tp], z, negatives="same_step",
                                    interpret=True)
    np.testing.assert_allclose(float(loss_pal), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m_pal["acc"]),
                               np.asarray(m_ref["acc"]), atol=1e-7)


def test_gradient_parity():
    B, T, K, D = 4, 12, 3, 8
    preds, z = _data(B, T, K, D, seed=3)
    Tp = T - K

    def loss_ref(p, zz):
        return infonce_loss_and_metrics(p, zz, negatives="same_step")[0]

    def loss_pal(p, zz):
        return fused_infonce(p[:, :Tp], zz, negatives="same_step",
                             interpret=True)[0]

    gr_p, gr_z = jax.grad(loss_ref, argnums=(0, 1))(preds, z)
    gp_p, gp_z = jax.grad(loss_pal, argnums=(0, 1))(preds, z)
    # reference grads flow into preds[:, :Tp] only; the fused op slices first
    np.testing.assert_allclose(np.asarray(gp_p[:, :Tp]),
                               np.asarray(gr_p[:, :Tp]), rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(gp_p[:, Tp:]), 0.0)
    np.testing.assert_allclose(np.asarray(gp_z), np.asarray(gr_z),
                               rtol=1e-5, atol=1e-7)


def test_cross_replica_shift_parity():
    # shifted labels (replica offset into the gathered pool)
    B, T, K, D, C = 2, 10, 2, 8, 6
    preds, z = _data(B, T, K, D, C=C, seed=5)
    Tp = T - K
    # jnp reference with a manual shift: emulate replica rows [2, 4) of 6
    from cpc_tpu.ops.infonce import stacked_targets, _ce_and_acc
    tgt = stacked_targets(z, K)
    scores = jnp.einsum("itkd,jtkd->tkij", preds[:, :Tp], tgt)
    labels = jnp.broadcast_to(2 + jnp.arange(B), (Tp, K, B))
    loss_ref, acc_ref = _ce_and_acc(scores, labels)

    loss_pal, m_pal = fused_infonce(preds[:, :Tp], z, negatives="same_step",
                                    shift=2, interpret=True)
    np.testing.assert_allclose(float(loss_pal), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m_pal["acc"]), np.asarray(acc_ref),
                               atol=1e-7)


def test_use_pallas_flag_routes_through_kernel():
    B, T, K, D = 4, 14, 3, 8
    preds, z = _data(B, T, K, D, seed=9)
    l1, m1 = infonce_loss_and_metrics(preds, z, negatives="same_step",
                                      use_pallas=False)
    l2, m2 = infonce_loss_and_metrics(preds, z, negatives="same_step",
                                      use_pallas=True)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2["acc"]), np.asarray(m1["acc"]),
                               atol=1e-7)


def test_all_steps_fallback_parity():
    B, T, K, D = 3, 12, 2, 8
    preds, z = _data(B, T, K, D, seed=11)
    l1, m1 = infonce_loss_and_metrics(preds, z, negatives="all_steps",
                                      use_pallas=False)
    l2, m2 = infonce_loss_and_metrics(preds, z, negatives="all_steps",
                                      use_pallas=True)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2["acc"]), np.asarray(m1["acc"]),
                               atol=1e-7)


def test_k_tiling_path_parity(monkeypatch):
    # shrink the VMEM budget so _choose_kt picks KT > 1, then check parity
    import cpc_tpu.ops.infonce_pallas as ip
    B, T, K, D = 128, 12, 2, 16  # KG*B = 128 when KT=2 (lane-aligned)
    monkeypatch.setattr(ip, "_VMEM_BUDGET", 300_000)
    assert ip._choose_kt(K, B, B, D, 4) == 2
    preds, z = _data(B, T, K, D, seed=13)
    Tp = T - K
    loss_ref, m_ref = infonce_loss_and_metrics(preds, z, negatives="same_step")
    loss_pal, m_pal = ip.fused_infonce(preds[:, :Tp], z, interpret=True)
    np.testing.assert_allclose(float(loss_pal), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m_pal["acc"]),
                               np.asarray(m_ref["acc"]), atol=1e-7)

    # gradient parity through the tiled path (incl. dz VMEM accumulation)
    def f_ref(p, zz):
        return infonce_loss_and_metrics(p, zz, negatives="same_step")[0]

    def f_pal(p, zz):
        return ip.fused_infonce(p[:, :Tp], zz, interpret=True)[0]

    gr = jax.grad(f_ref, argnums=(0, 1))(preds, z)
    gp = jax.grad(f_pal, argnums=(0, 1))(preds, z)
    np.testing.assert_allclose(np.asarray(gp[0][:, :Tp]),
                               np.asarray(gr[0][:, :Tp]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-7)


def test_allsteps_fused_forward_parity():
    B, T, K, D = 4, 16, 3, 8
    preds, z = _data(B, T, K, D, seed=17)
    l1, m1 = infonce_loss_and_metrics(preds, z, negatives="all_steps",
                                      use_pallas=False)
    from cpc_tpu.ops.infonce_allsteps_pallas import fused_infonce_allsteps
    Tp = T - K
    l2, m2 = fused_infonce_allsteps(preds[:, :Tp], z, interpret=True)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2["acc"]), np.asarray(m1["acc"]),
                               atol=1e-7)


def test_allsteps_fused_gradient_parity():
    B, T, K, D = 3, 12, 2, 8
    preds, z = _data(B, T, K, D, seed=19)
    Tp = T - K

    def loss_ref(p, zz):
        return infonce_loss_and_metrics(p, zz, negatives="all_steps")[0]

    def loss_pal(p, zz):
        from cpc_tpu.ops.infonce_allsteps_pallas import fused_infonce_allsteps
        return fused_infonce_allsteps(p[:, :Tp], zz, interpret=True)[0]

    gr = jax.grad(loss_ref, argnums=(0, 1))(preds, z)
    gp = jax.grad(loss_pal, argnums=(0, 1))(preds, z)
    np.testing.assert_allclose(np.asarray(gp[0][:, :Tp]),
                               np.asarray(gr[0][:, :Tp]), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-6)


def test_allsteps_route_through_flag():
    B, T, K, D = 3, 14, 2, 8
    preds, z = _data(B, T, K, D, seed=23)
    l1, m1 = infonce_loss_and_metrics(preds, z, negatives="all_steps",
                                      use_pallas=False)
    l2, m2 = infonce_loss_and_metrics(preds, z, negatives="all_steps",
                                      use_pallas=True)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2["acc"]), np.asarray(m1["acc"]),
                               atol=1e-7)


def test_allsteps_tile_defaults(monkeypatch):
    """The chip-swept (512, 4096) defaults (docs/DESIGN.md 'the all-steps
    perf pass'): CT clamps to the pool's 128-padded size so small pools
    don't sweep padding, and the env overrides still win."""
    from cpc_tpu.ops.infonce_allsteps_pallas import _tiles
    for var in ("CPC_ALLSTEPS_RT", "CPC_ALLSTEPS_CT"):
        monkeypatch.delenv(var, raising=False)
    assert _tiles(384000, 32768) == (512, 4096)   # 5.12 s study shape
    assert _tiles(187392, 16384) == (512, 4096)   # 2.56 s study shape
    assert _tiles(187392, 2048) == (512, 2048)    # pool < 4096: exact tile
    assert _tiles(187392, 2000) == (512, 2048)    # ... padded to 128
    assert _tiles(100, 300) == (104, 384)         # tiny: 8/128-rounded
    monkeypatch.setenv("CPC_ALLSTEPS_RT", "256")
    monkeypatch.setenv("CPC_ALLSTEPS_CT", "1024")
    assert _tiles(384000, 32768) == (256, 1024)   # sweep overrides win


def test_allsteps_tile_width_scaling(monkeypatch):
    """The CT budget is D=512-measured (dZ accumulator is (CT, D) fp32):
    wider d_enc scales it down proportionally, narrower keeps the cap."""
    from cpc_tpu.ops.infonce_allsteps_pallas import _tiles
    for var in ("CPC_ALLSTEPS_RT", "CPC_ALLSTEPS_CT"):
        monkeypatch.delenv(var, raising=False)
    assert _tiles(384000, 32768, 1024) == (512, 2048)
    assert _tiles(384000, 32768, 2048) == (512, 1024)
    assert _tiles(384000, 32768, 256) == (512, 4096)  # capped, not scaled up
