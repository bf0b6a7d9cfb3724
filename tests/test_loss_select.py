"""Trace-time loss-path auto-selection (SURVEY.md §8.4, VERDICT r2 #4):
large-candidate-pool configs must route to the K-tiled kernel instead of
warning-then-crashing in the fused kernel's VMEM guard."""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig, EncoderConfig,
                            LossConfig, ModelConfig, presets)
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.train.train_step import (init_state, make_step_fns,
                                      resolve_fuse_heads)


def _with_batch(cfg, b):
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=b))


def test_resolver_keeps_fused_inside_envelope():
    assert resolve_fuse_heads(presets.tpu_fast()) is True


def test_resolver_downgrades_large_global_batch():
    cfg = _with_batch(presets.dp_global_negatives(), 512)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert resolve_fuse_heads(cfg) is False
    assert any("envelope" in str(w.message) for w in rec)


def test_resolver_uses_local_pool_without_cross_replica():
    """Without cross-replica gathering the pool is the per-replica batch:
    batch 512 over 8 replicas = C 64, inside the envelope."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cpc_tpu.parallel.mesh import make_mesh
    cfg = _with_batch(presets.dp_global_negatives(), 512)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, loss=dataclasses.replace(cfg.model.loss,
                                            cross_replica=False)))
    assert resolve_fuse_heads(cfg, make_mesh((8,), ("data",))) is True
    # and WITH cross replica the same mesh still sees the global pool
    assert resolve_fuse_heads(
        _with_batch(presets.dp_global_negatives(), 512),
        make_mesh((8,), ("data",))) is False


def test_oversize_pool_builds_and_steps(monkeypatch):
    """End to end: a config whose pool exceeds the envelope builds WITHOUT
    manual flags and its loss matches the fused path's math (both reduce to
    the same jnp reference)."""
    import cpc_tpu.ops.infonce_fused as fused_mod
    cfg = CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                                  strides=(5, 4), d_enc=16),
            ar=ArConfig(d_ar=8),
            loss=LossConfig(prediction_steps=2, use_pallas=True,
                            fuse_heads=True),
        ),
        data=DataConfig(batch_size=16, snippet_samples=2000),
    )
    model = CPCModel(cfg.model)
    b = np.clip(np.random.default_rng(0).standard_normal(
        (16, 2000)) * 8000, -32768, 32767).astype(np.int16)

    # within the (patched tiny) envelope: fused path
    monkeypatch.setattr(fused_mod, "MEASURED_C_ENVELOPE", 16)
    steps_f = make_step_fns(cfg, model, None)
    params, opt_state = init_state(cfg, model, steps_f.optimizer)
    _, _, m_f = steps_f.train_step(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
        jnp.asarray(b))

    # above it: auto-downgrade, still builds + steps, same loss
    monkeypatch.setattr(fused_mod, "MEASURED_C_ENVELOPE", 8)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        steps_k = make_step_fns(cfg, model, None)
    assert any("envelope" in str(w.message) for w in rec)
    _, _, m_k = steps_k.train_step(params, opt_state, jnp.asarray(b))
    np.testing.assert_allclose(float(m_k["loss"]), float(m_f["loss"]),
                               rtol=1e-4)


def test_gru_pallas_envelope_fallback(monkeypatch):
    """Batches above the GRU kernel's measured compile envelope fall back
    to the lax.scan recurrence with a warning — same math, no flags."""
    import cpc_tpu.ops.gru_pallas as gp
    from cpc_tpu.models.gru import GRU
    gru = GRU(hidden_size=8, use_pallas=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 10, 4)),
                    jnp.float32)
    params = gru.init(jax.random.key(0), x)
    ref = gru.apply(params, x)  # B=6 <= patched envelope: kernel path
    monkeypatch.setattr(gp, "MEASURED_B_ENVELOPE", 4)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = gru.apply(params, x)  # B=6 > 4: scan path
    assert any("envelope" in str(w.message) for w in rec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_infonce_pallas_rows_envelope_fallback(monkeypatch):
    """Prediction-row counts above the K-tiled kernel's measured backward
    envelope fall back to the jnp scorer with a warning — same loss."""
    import cpc_tpu.ops.infonce_pallas as ip
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    rng = np.random.default_rng(0)
    B, T, K, D = 6, 12, 2, 8
    preds = jnp.asarray(rng.standard_normal((B, T, K, D)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    ref, _ = infonce_loss_and_metrics(preds, z, use_pallas=False)
    monkeypatch.setattr(ip, "MEASURED_ROWS_ENVELOPE", 4)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got, m = infonce_loss_and_metrics(preds, z, use_pallas=True)
    assert any("envelope" in str(w.message) for w in rec)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_gru_pallas_width_envelope_fallback(monkeypatch):
    """Hidden widths above the GRU kernel's measured compile envelope fall
    back to lax.scan with a warning (r5, run-7 arm W: H=512 at B=64 fails
    TPU compile with a scoped-vmem stack OOM) — same math, no flags."""
    import cpc_tpu.ops.gru_pallas as gp
    from cpc_tpu.models.gru import GRU
    gru = GRU(hidden_size=8, use_pallas=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 10, 4)),
                    jnp.float32)
    params = gru.init(jax.random.key(0), x)
    ref = gru.apply(params, x)  # H=8 <= envelope: kernel path
    monkeypatch.setattr(gp, "MEASURED_H_ENVELOPE", 4)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = gru.apply(params, x)  # H=8 > 4: scan path
    assert any("envelope" in str(w.message) for w in rec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
