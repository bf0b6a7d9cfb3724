"""InfoNCE reference-impl tests (SURVEY.md §5.1): the vectorized jnp loss
against a straight-line O(B^2*T*K) numpy oracle, in both negative layouts."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpc_tpu.ops.infonce import infonce_loss_and_metrics, stacked_targets


def _numpy_oracle(preds, z, K, mode):
    """Literal-loop InfoNCE: for every (i, t, k), softmax-CE over candidates."""
    B, T, _, D = preds.shape
    Tp = T - K
    losses, correct = [], np.zeros(K)
    counts = np.zeros(K)
    for i in range(B):
        for t in range(Tp):
            for k in range(K):
                p = preds[i, t, k]
                if mode == "same_step":
                    cands = z[:, t + k + 1]  # (B, D)
                    label = i
                else:
                    cands = z.reshape(B * T, D)
                    label = i * T + (t + k + 1)
                s = cands @ p
                s = s - s.max()
                logp = s - np.log(np.exp(s).sum())
                losses.append(-logp[label])
                correct[k] += float(np.argmax(s) == label)
                counts[k] += 1
    return np.mean(losses), correct / counts


@pytest.mark.parametrize("mode", ["same_step", "all_steps"])
def test_matches_numpy_oracle(mode):
    rng = np.random.default_rng(42)
    B, T, K, D = 4, 10, 3, 6
    preds = rng.standard_normal((B, T, K, D)).astype(np.float32)
    z = rng.standard_normal((B, T, D)).astype(np.float32)

    loss, metrics = infonce_loss_and_metrics(
        jnp.asarray(preds), jnp.asarray(z), negatives=mode
    )
    oracle_loss, oracle_acc = _numpy_oracle(preds, z, K, mode)
    np.testing.assert_allclose(float(loss), oracle_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics["acc"]), oracle_acc,
                               rtol=1e-6, atol=1e-6)
    assert metrics["acc"].shape == (K,)


def test_stacked_targets_layout():
    B, T, D, K = 2, 8, 3, 4
    z = jnp.arange(B * T * D, dtype=jnp.float32).reshape(B, T, D)
    tgt = stacked_targets(z, K)
    assert tgt.shape == (B, T - K, K, D)
    for t in range(T - K):
        for k in range(K):
            np.testing.assert_array_equal(np.asarray(tgt[:, t, k]),
                                          np.asarray(z[:, t + k + 1]))


def test_perfect_predictions_have_high_accuracy():
    # If preds exactly equal the (distinctive) targets, argmax must pick them.
    rng = np.random.default_rng(7)
    B, T, K, D = 4, 12, 2, 8
    z = rng.standard_normal((B, T, D)).astype(np.float32)
    # unit-normalize so the positive (self) dot strictly dominates: z_i.z_i=1
    # > z_i.z_j for i != j almost surely.
    z = z / np.linalg.norm(z, axis=-1, keepdims=True)
    preds = np.zeros((B, T, K, D), dtype=np.float32)
    for t in range(T - K):
        for k in range(K):
            preds[:, t, k] = z[:, t + k + 1]
    _, metrics = infonce_loss_and_metrics(
        jnp.asarray(preds), jnp.asarray(z), negatives="same_step"
    )
    assert float(metrics["acc_mean"]) == 1.0
