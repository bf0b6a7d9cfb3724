"""Fused InfoNCE Pallas kernel (SURVEY.md §2 N2, §8.4; BASELINE.json:5).

The reference computes InfoNCE as an eager torch matmul + F.cross_entropy,
materializing the full score tensor (SURVEY.md §3 "InfoNCE loss & scoring").
Here scoring + softmax-CE + accuracy run as ONE Pallas kernel per direction
and the (Tp, K, B, C) score tensor never touches HBM.

Structure (same_step negatives — the reference's in-batch layout, and the
production cross-replica path where C = the all-gathered global batch):

  grid = (T-1,) over TARGET time tau. The K prediction groups (t, k) with
  t + k + 1 == tau all score against the same candidate slab z[:, tau, :]:

    * the K (B, D) prediction blocks arrive via K block specs on the same
      preds array whose index maps clamp out-of-range (t, k) pairs (sequence
      edges) — no host/HBM regrouping of preds ever happens;
    * z_tau is loaded ONCE per tau (K x less candidate traffic than a
      per-(t,k) loop);
    * one (K*B, D) x (D, C) MXU matmul produces all scores for tau;
    * row-wise max/log-sum-exp, positive extraction, NLL and argmax-accuracy
      happen in VMEM; outputs are flat (T-1, K*B) NLL/correct arrays, with
      edge (invalid) rows masked out by the caller's reduction.

  The backward (custom_vjp) recomputes scores with the same structure —
  flash-attention-style recompute instead of storing softmax:
    dz[tau]  = delta^T @ P_eff      (one matmul per tau)
    dP_eff   = delta   @ z_tau      (one matmul per tau)
  where delta = (softmax - onehot) * g, with invalid rows zeroed. dP_eff is
  un-permuted back to (Tp, K, B, D) by a single XLA gather.

Parity: elementwise vs the jnp reference (cpc_tpu.ops.infonce) in interpret
mode on CPU and compiled on TPU (tests/test_pallas_infonce.py) — SURVEY.md
§5.2's operationalization of the fp32 parity requirement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _preds_spec(K: int, B: int, D: int, Tp: int, k: int) -> pl.BlockSpec:
    """Block spec for the k-th prediction group at grid step ti (tau = ti+1):
    block (t, k) of the (Tp, K, B, D) preds array with t = tau-1-k, clamped
    into range at sequence edges (clamped loads are masked downstream)."""
    def index_map(ti, shift_ref):
        return (jnp.clip(ti - k, 0, Tp - 1), k, 0, 0)
    return pl.BlockSpec((1, 1, B, D), index_map, memory_space=pltpu.VMEM)


def _row_validity(tau, K: int, B: int, Tp: int):
    """(K*B,) bool: row r = k*B + i is a real (t, k) group at this tau."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (K * B, 1), 0)[:, 0]
    t = tau - 1 - rows // B
    return jnp.logical_and(t >= 0, t < Tp)


def _scores(p_refs, z, K: int):
    p_eff = jnp.concatenate([p_refs[k][0, 0] for k in range(K)], axis=0)
    s = jax.lax.dot_general(
        p_eff, z, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (K*B, C)
    return p_eff, s


def _labels(shift, K: int, B: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (K * B, 1), 0)[:, 0]
    return shift + rows % B


def _fwd_kernel(shift_ref, *refs, K: int, B: int, C: int, Tp: int):
    p_refs, z_ref = refs[:K], refs[K]
    nll_ref, cor_ref = refs[K + 1], refs[K + 2]

    _, s = _scores(p_refs, z_ref[0], K)
    m = jnp.max(s, axis=-1, keepdims=True)
    lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(s - m), axis=-1))
    labels = _labels(shift_ref[0], K, B)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K * B, C), 1)
    s_lab = jnp.sum(jnp.where(cols == labels[:, None], s, 0.0), axis=-1)
    nll_ref[0, 0, :] = lse - s_lab
    cor_ref[0, 0, :] = (jnp.argmax(s, axis=-1) == labels).astype(jnp.float32)


def _bwd_kernel(shift_ref, *refs, K: int, B: int, C: int, Tp: int):
    g_ref = refs[0]
    p_refs, z_ref = refs[1:K + 1], refs[K + 1]
    dz_ref, dp_ref = refs[K + 2], refs[K + 3]

    tau = pl.program_id(0) + 1
    p_eff, s = _scores(p_refs, z_ref[0], K)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    soft = e / jnp.sum(e, axis=-1, keepdims=True)
    labels = _labels(shift_ref[0], K, B)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K * B, C), 1)
    delta = soft - (cols == labels[:, None]).astype(jnp.float32)
    valid = _row_validity(tau, K, B, Tp).astype(jnp.float32)
    delta = delta * (g_ref[0, 0, :] * valid)[:, None]

    dz_ref[0] = jax.lax.dot_general(  # (C, K*B) x (K*B, D)
        delta, p_eff, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_ref[0] = jax.lax.dot_general(  # (K*B, C) x (C, D)
        delta, z_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_same_step_nll(preds, z, shift, interpret=False):
    """preds (Tp, K, B, D) fp32, z (T, C, D) fp32, shift () int32 ->
    (nll (T-1, K*B), correct (T-1, K*B)); rows for out-of-range (t, k)
    groups hold garbage — mask with `validity_mask` before reducing."""
    return _pallas_fwd(preds, z, shift, interpret)


def validity_mask(T: int, K: int, B: int, Tp: int) -> jnp.ndarray:
    """(T-1, K*B) fp32 mask matching the kernel's flat output layout."""
    tau = jnp.arange(1, T)[:, None]
    rows = jnp.arange(K * B)[None, :]
    t = tau - 1 - rows // B
    return jnp.logical_and(t >= 0, t < Tp).astype(jnp.float32)


def _pallas_fwd(preds, z, shift, interpret):
    Tp, K, B, D = preds.shape
    T, C, _ = z.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T - 1,),
        in_specs=[
            *[_preds_spec(K, B, D, Tp, k) for k in range(K)],
            pl.BlockSpec((1, C, D), lambda ti, s: (ti + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, K * B), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K * B), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    nll3, cor3 = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, B=B, C=C, Tp=Tp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T - 1, 1, K * B), jnp.float32),
            jax.ShapeDtypeStruct((T - 1, 1, K * B), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (T - 1) * K * B * C * D,
            bytes_accessed=4 * (T - 1) * (K * B * D + C * D + 2 * K * B),
            transcendentals=(T - 1) * K * B * C,
        ),
    )(jnp.asarray([shift], jnp.int32), *([preds] * K), z)
    return nll3[:, 0, :], cor3[:, 0, :]


def _fwd_rule(preds, z, shift, interpret):
    out = _pallas_fwd(preds, z, shift, interpret)
    return out, (preds, z, shift)


def _bwd_rule(interpret, res, cots):
    preds, z, shift = res
    g_nll, _g_cor = cots  # accuracy is argmax: non-differentiable
    Tp, K, B, D = preds.shape
    T, C, _ = z.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T - 1,),
        in_specs=[
            pl.BlockSpec((1, 1, K * B), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            *[_preds_spec(K, B, D, Tp, k) for k in range(K)],
            pl.BlockSpec((1, C, D), lambda ti, s: (ti + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, D), lambda ti, s: (ti + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * B, D), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dz, dp_eff = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, B=B, C=C, Tp=Tp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, C, D), jnp.float32),
            jax.ShapeDtypeStruct((T - 1, K * B, D), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * (T - 1) * K * B * C * D,
            bytes_accessed=4 * (T - 1) * (2 * K * B * D + 2 * C * D),
            transcendentals=(T - 1) * K * B * C,
        ),
    )(jnp.asarray([shift], jnp.int32),
      g_nll.astype(jnp.float32).reshape(T - 1, 1, K * B),
      *([preds] * K), z)
    # tau = 0 is never a target: its dz block is unwritten garbage.
    dz = dz.at[0].set(0.0)
    # un-permute dP: dpreds[t, k] = dp_eff[t + k, k-th B block] (tau-1 = t+k)
    dp_eff = dp_eff.reshape(T - 1, K, B, D)
    t_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(K)[None, :]
    dpreds = dp_eff[t_idx + k_idx, k_idx]  # (Tp, K, B, D)
    return dpreds, dz, None


fused_same_step_nll.defvjp(_fwd_rule, _bwd_rule)


def fused_infonce(
    preds_v: jnp.ndarray,  # (B, Tp, K, D) predictions over the valid window
    z_pool: jnp.ndarray,   # (C, T, D) candidate latents (global under DP)
    *,
    negatives: str = "same_step",
    shift: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Drop-in fused replacement for the scoring+CE block of
    cpc_tpu.ops.infonce.infonce_loss_and_metrics."""
    # Mosaic targets TPU only; elsewhere (CPU tests, virtual meshes) run the
    # interpreter, which doubles as the §5.2 parity oracle.
    interpret = interpret or jax.default_backend() != "tpu"
    if negatives != "same_step":
        # all_steps fused kernel not implemented yet: jnp fallback.
        from cpc_tpu.ops import infonce as ref
        B, Tp, K, D = preds_v.shape
        C, T, _ = z_pool.shape
        flat = z_pool.reshape(C * T, D)
        scores = jnp.einsum("itkd,nd->tkin", preds_v.astype(jnp.float32),
                            flat.astype(jnp.float32))
        t_idx = jnp.arange(Tp)[:, None, None]
        k_idx = jnp.arange(K)[None, :, None]
        i_idx = jnp.arange(B)[None, None, :]
        labels = jnp.broadcast_to(
            (shift + i_idx) * T + (t_idx + k_idx + 1), (Tp, K, B))
        loss, acc = ref._ce_and_acc(scores, labels)
        return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}

    B, Tp, K, D = preds_v.shape
    C, T, _ = z_pool.shape
    preds_t = preds_v.transpose(1, 2, 0, 3)  # (Tp, K, B, D)
    z_t = z_pool.transpose(1, 0, 2)          # (T, C, D)
    nll, correct = fused_same_step_nll(
        preds_t.astype(jnp.float32), z_t.astype(jnp.float32),
        jnp.asarray(shift, jnp.int32), interpret)
    mask = validity_mask(T, K, B, Tp)
    denom = Tp * B  # valid rows per k
    loss = jnp.sum(nll * mask) / (denom * K)
    mask_k = mask.reshape(T - 1, K, B)
    acc = jnp.sum((correct * mask).reshape(T - 1, K, B), axis=(0, 2)) / denom
    return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}
