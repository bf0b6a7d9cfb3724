"""InfoNCE loss and k-step accuracies — pure-jnp reference implementation.

Reference capability (SURVEY.md §3 "InfoNCE loss & scoring", §4.1, §A):
bilinear scores (W_k c_t) . z_j against in-batch negatives, softmax
cross-entropy with the positive on the diagonal, plus per-k prediction
accuracy (the online training metric, BASELINE.json:2).

Conventions (the parity spec for every other implementation in this repo —
the Pallas fused kernel is tested elementwise against this file):

  * preds[:, t, k] is the prediction of z[:, t + k + 1]  (offsets 1..K);
  * predictions are taken from the uniform window t in [0, T-K) so shapes
    stay static for XLA (all K offsets share the same set of context steps);
  * 'same_step' negatives: candidates for a (t, k) prediction are the B
    latents z[:, t+k+1] across the batch — a B-way softmax, positives on
    the diagonal (the reference's in-batch layout);
  * 'all_steps' negatives: candidates are all B*T latents (same sequence at
    other steps + other sequences — the CPC-paper pool); the positive index
    is j*T + (t+k+1) for batch row j;
  * cross-replica ('global') negatives: z is all-gathered over the data mesh
    axis before scoring, so the candidate pool is the global batch
    (BASELINE.json:10); labels shift by axis_index * B_local.

Scores are computed in fp32 regardless of activation dtype — log-sum-exp in
bf16 costs accuracy for no meaningful speed gain at these sizes.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def stacked_targets(z: jnp.ndarray, num_steps: int) -> jnp.ndarray:
    """z (B, T, D) -> targets (B, Tp, K, D) with targets[:, t, k] = z[:, t+k+1],
    Tp = T - K."""
    B, T, D = z.shape
    Tp = T - num_steps
    if Tp <= 0:
        raise ValueError(
            f"sequence of {T} latents is too short for K={num_steps} offsets"
        )
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(z, k + 1, Tp, axis=1)
         for k in range(num_steps)],
        axis=2,
    )


def _ce_and_acc(
    scores: jnp.ndarray, labels: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """scores (..., K, B, C) fp32, labels (..., K, B) int -> (loss scalar,
    acc (K,))."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    correct = (jnp.argmax(scores, axis=-1) == labels).astype(jnp.float32)
    # mean over everything except the K axis (axis -2 of nll is B; K is -3... )
    loss = jnp.mean(nll)
    # accuracies per k: nll/correct have shape (Tp, K, B) (or (K, B) slices);
    # reduce all axes except the K axis (-2 from the right of (..., K, B)).
    reduce_axes = tuple(i for i in range(correct.ndim) if i != correct.ndim - 2)
    acc = jnp.mean(correct, axis=reduce_axes)
    return loss, acc


def infonce_loss_and_metrics(
    preds: jnp.ndarray,
    z: jnp.ndarray,
    *,
    negatives: str = "same_step",
    axis_name: Optional[str] = None,
    use_pallas: bool = False,
    pallas_bf16: bool = False,
    ring: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """InfoNCE loss + per-k accuracy.

    preds: (B, T, K, D) predictions W_k c_t (from CPCModel).
    z:     (B, T, D) encoder latents (targets).
    negatives: 'same_step' | 'all_steps'.
    axis_name: if set, z is all-gathered over this mesh axis so negatives are
        the global batch (cross-replica negative sharing, BASELINE.json:10).
    use_pallas: route the score+softmax-CE block through the fused Pallas
        kernel (cpc_tpu.ops.infonce_pallas) instead of the jnp path.
    ring: with negatives='all_steps' and axis_name set, sweep the global
        candidate pool over a ppermute ring instead of all-gathering it
        (cpc_tpu.ops.infonce_ring) — per-replica memory stays constant in
        the replica count.

    Returns (loss, {"loss": ..., "acc": (K,), "acc_mean": ...}).
    """
    B, T, K, D = preds.shape
    Tp = T - K

    if ring and axis_name is not None:
        if negatives != "all_steps":
            raise ValueError("ring negatives exist for the all_steps pool; "
                             "same_step already gathers only z")
        from cpc_tpu.ops.infonce_ring import ring_infonce_allsteps
        return ring_infonce_allsteps(preds[:, :Tp], z, axis_name=axis_name)

    if use_pallas:
        from cpc_tpu.ops import infonce_pallas
        if B > infonce_pallas.MEASURED_ROWS_ENVELOPE:
            import warnings
            warnings.warn(
                f"loss.use_pallas: {B} prediction rows exceed the InfoNCE "
                f"kernel's measured backward-compile envelope "
                f"({infonce_pallas.MEASURED_ROWS_ENVELOPE} on v5e); using "
                f"the jnp path (same math; under DP the per-replica row "
                f"count is what matters, and it is usually far smaller)",
                stacklevel=2)
            use_pallas = False

    if use_pallas:
        from cpc_tpu.ops.infonce_pallas import fused_infonce
        # bf16 wire halves the kernel's VMEM/HBM footprint AND the ICI bytes
        # of the cross-replica all-gather; accumulation stays fp32 inside.
        kdtype = jnp.bfloat16 if pallas_bf16 else jnp.float32
        zc = z.astype(kdtype)
        if axis_name is not None:
            z_all = jax.lax.all_gather(zc, axis_name)
            z_pool = z_all.reshape(z_all.shape[0] * B, T, D)
            shift = jax.lax.axis_index(axis_name) * B
        else:
            z_pool, shift = zc, 0
        return fused_infonce(preds[:, :Tp].astype(kdtype), z_pool,
                             negatives=negatives, shift=shift)

    preds_v = preds[:, :Tp].astype(jnp.float32)  # (B, Tp, K, D)
    zf = z.astype(jnp.float32)
    if axis_name is not None:
        # (R, B, T, D) -> (R*B, T, D); this replica's rows start at shift.
        z_all = jax.lax.all_gather(zf, axis_name)
        R = z_all.shape[0]
        z_pool = z_all.reshape(R * B, T, D)
        shift = jax.lax.axis_index(axis_name) * B
    else:
        z_pool = zf
        shift = 0

    if negatives == "same_step":
        tgt = stacked_targets(z_pool, K)  # (C, Tp, K, D), C = pool batch
        # scores[t, k, i, j] = preds[i, t, k] . z_pool[j, t+k+1]
        scores = jnp.einsum("itkd,jtkd->tkij", preds_v, tgt)
        labels = jnp.broadcast_to(shift + jnp.arange(B), (Tp, K, B))
    elif negatives == "all_steps":
        C = z_pool.shape[0]
        flat = z_pool.reshape(C * T, D)
        # scores[t, k, i, n] = preds[i, t, k] . flat[n]
        scores = jnp.einsum("itkd,nd->tkin", preds_v, flat)
        t_idx = jnp.arange(Tp)[:, None, None]
        k_idx = jnp.arange(K)[None, :, None]
        i_idx = jnp.arange(B)[None, None, :]
        labels = (shift + i_idx) * T + (t_idx + k_idx + 1)
        labels = jnp.broadcast_to(labels, (Tp, K, B))
    else:
        raise ValueError(f"unknown negatives mode {negatives!r}")

    loss, acc = _ce_and_acc(scores, labels)
    metrics = {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}
    return loss, metrics
