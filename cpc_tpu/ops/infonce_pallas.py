"""Fused InfoNCE Pallas kernel (SURVEY.md §2 N2, §8.4; BASELINE.json:5).

The reference computes InfoNCE as an eager torch matmul + F.cross_entropy,
materializing the full score tensor (SURVEY.md §3 "InfoNCE loss & scoring").
Here scoring + softmax-CE + accuracy run as ONE Pallas kernel per direction
and the (Tp, K, B, C) score tensor never touches HBM.

Structure (same_step negatives — the reference's in-batch layout, and the
production cross-replica path where C = the all-gathered global batch):

  grid = (T-1, KT) over (TARGET time tau, prediction-step tile). The K
  prediction groups (t, k) with t + k + 1 == tau all score against the same
  candidate slab z[:, tau, :]; a tile covers KG = K / KT of them:

    * the KG (B, D) prediction blocks arrive via KG block specs on the same
      preds array whose index maps clamp out-of-range (t, k) pairs (sequence
      edges) — no host/HBM regrouping of preds ever happens;
    * z_tau is loaded once per tau and stays resident across the KT inner
      tiles (consecutive grid steps with an unchanged index map skip the
      re-fetch), so candidate traffic is K x lower than a per-(t,k) loop;
    * one (KG*B, D) x (D, C) MXU matmul produces the tile's scores;
    * row-wise max/log-sum-exp, positive extraction, NLL and argmax-accuracy
      happen in VMEM; outputs are flat (T-1, KT, KG*B) NLL/correct arrays,
      with edge (invalid) rows masked out by the caller's reduction.

  KT is chosen from a VMEM estimate (`_choose_kt`) so large batches fit the
  ~16 MB budget; KT == 1 for small/parity shapes.

  The backward (custom_vjp) recomputes scores with the same structure —
  flash-attention-style recompute instead of storing softmax:
    dz[tau]  += delta^T @ P_tile     (accumulated in VMEM across the KT
                                      tiles — the block index is unchanged,
                                      so no HBM round-trip)
    dP_tile  = delta   @ z_tau
  where delta = (softmax - onehot) * g with invalid rows zeroed. dP is
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

# Largest PRED-ROW batch at which this kernel's backward measurably
# compiles on v5e (r3, benchmarks/exp_envelope.py isolation): B=512 full
# train steps run; at B=1024 the forward compiles (461 s) but the backward
# crashes the Mosaic compile helper. The candidate-pool axis C is NOT the
# limit (C=1024 pools against <=512 rows compile and run — the
# DP-realistic v5e-8 shapes). ops.infonce falls back to the jnp path above
# this, mirroring the fused-heads and GRU envelope choosers.
MEASURED_ROWS_ENVELOPE = 512
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the ~16 MB per core


def _choose_kt(K: int, B: int, C: int, D: int, itemsize: int) -> int:
    """Smallest divisor KT of K such that the working set fits VMEM.
    When KT > 1 the flat row block KG*B must stay lane-aligned (128)."""
    for kt in range(1, K + 1):
        if K % kt:
            continue
        kg = K // kt
        if kt > 1 and (kg * B) % 128 != 0:
            continue
        rows = kg * B
        est = (
            2 * rows * D * itemsize      # double-buffered preds blocks
            + 2 * C * D * itemsize       # double-buffered z slab
            + 4 * rows * C * 4           # scores + exp + argmax temporaries
            + rows * D * 4               # p_eff concat / dP tile
            + C * D * 4                  # dz accumulator (bwd)
        )
        if est <= _VMEM_BUDGET:
            return kt
    return K  # last resort: one prediction step per tile


def _preds_spec(KG: int, B: int, D: int, Tp: int, kg: int) -> pl.BlockSpec:
    """Block spec for local group kg of the current K tile at grid step
    (ti, kt): block (t, k) of (Tp, K, B, D) with k = kt*KG + kg and
    t = tau-1-k (tau = ti+1), clamped at sequence edges."""
    def index_map(ti, kt, shift_ref):
        k = kt * KG + kg
        return (jnp.clip(ti - k, 0, Tp - 1), k, 0, 0)
    return pl.BlockSpec((1, 1, B, D), index_map, memory_space=pltpu.VMEM)


def _tile_rows(kt, KG: int, B: int):
    """Row metadata for the (KG*B,) flat tile: global k and batch index."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (KG * B, 1), 0)[:, 0]
    return kt * KG + rows // B, rows % B


def _fwd_kernel(shift_ref, *refs, KG: int, B: int, C: int, Tp: int):
    p_refs, z_ref = refs[:KG], refs[KG]
    nll_ref, cor_ref = refs[KG + 1], refs[KG + 2]
    kt = pl.program_id(1)

    z = z_ref[0]
    p_eff = jnp.concatenate([p_refs[kg][0, 0] for kg in range(KG)], axis=0)
    s = jax.lax.dot_general(
        p_eff, z, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (KG*B, C)

    _, i_of_row = _tile_rows(kt, KG, B)
    labels = shift_ref[0] + i_of_row
    m = jnp.max(s, axis=-1, keepdims=True)
    lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(s - m), axis=-1))
    cols = jax.lax.broadcasted_iota(jnp.int32, (KG * B, C), 1)
    s_lab = jnp.sum(jnp.where(cols == labels[:, None], s, 0.0), axis=-1)
    nll_ref[0, 0, :] = lse - s_lab
    cor_ref[0, 0, :] = (jnp.argmax(s, axis=-1) == labels).astype(jnp.float32)


def _bwd_kernel(shift_ref, *refs, KG: int, B: int, C: int, Tp: int):
    g_ref = refs[0]
    p_refs, z_ref = refs[1:KG + 1], refs[KG + 1]
    dz_ref, dp_ref = refs[KG + 2], refs[KG + 3]
    tau = pl.program_id(0) + 1
    kt = pl.program_id(1)

    z = z_ref[0]
    p_eff = jnp.concatenate([p_refs[kg][0, 0] for kg in range(KG)], axis=0)
    s = jax.lax.dot_general(
        p_eff, z, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    k_of_row, i_of_row = _tile_rows(kt, KG, B)
    labels = shift_ref[0] + i_of_row
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    soft = e / jnp.sum(e, axis=-1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, (KG * B, C), 1)
    delta = soft - (cols == labels[:, None]).astype(jnp.float32)
    t_of_row = tau - 1 - k_of_row
    valid = jnp.logical_and(t_of_row >= 0, t_of_row < Tp).astype(jnp.float32)
    delta = delta * (g_ref[0, 0, :] * valid)[:, None]

    dz_tile = jax.lax.dot_general(  # (C, KG*B) x (KG*B, D)
        delta, p_eff.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dz block index depends only on tau: it stays in VMEM across the KT
    # inner tiles, so accumulate and only the last tile's state is written.
    @pl.when(kt == 0)
    def _():
        dz_ref[0] = dz_tile

    @pl.when(kt > 0)
    def _():
        dz_ref[0] += dz_tile

    dp_ref[0] = jax.lax.dot_general(  # (KG*B, C) x (C, D)
        delta, z.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_same_step_nll(preds, z, shift, interpret=False):
    """preds (Tp, K, B, D), z (T, C, D), shift () int32 ->
    (nll (T-1, K*B) fp32, correct (T-1, K*B) fp32); rows for out-of-range
    (t, k) groups hold garbage — mask with `validity_mask` before reducing."""
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
    KT = _choose_kt(K, B, C, D, preds.dtype.itemsize)
    KG = K // KT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T - 1, KT),
        in_specs=[
            *[_preds_spec(KG, B, D, Tp, kg) for kg in range(KG)],
            pl.BlockSpec((1, C, D), lambda ti, kt, s: (ti + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, KG * B), lambda ti, kt, s: (ti, 0, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KG * B), lambda ti, kt, s: (ti, 0, kt),
                         memory_space=pltpu.VMEM),
        ],
    )
    nll3, cor3 = pl.pallas_call(
        functools.partial(_fwd_kernel, KG=KG, B=B, C=C, Tp=Tp),
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
    )(jnp.asarray([shift], jnp.int32), *([preds] * KG), z)
    return nll3[:, 0, :], cor3[:, 0, :]


def _fwd_rule(preds, z, shift, interpret):
    out = _pallas_fwd(preds, z, shift, interpret)
    return out, (preds, z, shift)


def _bwd_rule(interpret, res, cots):
    preds, z, shift = res
    g_nll, _g_cor = cots  # accuracy is argmax: non-differentiable
    Tp, K, B, D = preds.shape
    T, C, _ = z.shape
    KT = _choose_kt(K, B, C, D, preds.dtype.itemsize)
    KG = K // KT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T - 1, KT),
        in_specs=[
            pl.BlockSpec((1, 1, KG * B), lambda ti, kt, s: (ti, 0, kt),
                         memory_space=pltpu.VMEM),
            *[_preds_spec(KG, B, D, Tp, kg) for kg in range(KG)],
            pl.BlockSpec((1, C, D), lambda ti, kt, s: (ti + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, D), lambda ti, kt, s: (ti + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KG * B, D), lambda ti, kt, s: (ti, kt, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dz, dp_eff = pl.pallas_call(
        functools.partial(_bwd_kernel, KG=KG, B=B, C=C, Tp=Tp),
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
      *([preds] * KG), z)
    # tau = 0 is never a target: its dz block is unwritten garbage.
    dz = dz.at[0].set(0.0).astype(z.dtype)
    # un-permute dP: dpreds[t, k] = dp_eff[t + k, k-th B block] (tau-1 = t+k)
    dp_eff = dp_eff.reshape(T - 1, K, B, D)
    t_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(K)[None, :]
    dpreds = dp_eff[t_idx + k_idx, k_idx].astype(preds.dtype)
    return dpreds, dz, None


fused_same_step_nll.defvjp(_fwd_rule, _bwd_rule)


def fused_infonce(
    preds_v: jnp.ndarray,  # (B, Tp, K, D) predictions over the valid window
    z_pool: jnp.ndarray,   # (C, T, D) candidate latents (global under DP)
    *,
    negatives: str = "same_step",
    shift: int = 0,
    interpret: bool = False,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, dict]:
    """Drop-in fused replacement for the scoring+CE block of
    cpc_tpu.ops.infonce.infonce_loss_and_metrics.

    compute_dtype: wire dtype into the kernel's matmuls (accumulation is
    always fp32 via preferred_element_type). None keeps the input dtype;
    fp32 is the parity config; bfloat16 halves kernel HBM/VMEM traffic and
    doubles MXU rate.
    """
    # Mosaic targets TPU only; elsewhere (CPU tests, virtual meshes) run the
    # interpreter, which doubles as the §5.2 parity oracle.
    interpret = interpret or jax.default_backend() != "tpu"
    if negatives != "same_step":
        from cpc_tpu.ops.infonce_allsteps_pallas import fused_infonce_allsteps
        if compute_dtype is not None:
            preds_v = preds_v.astype(compute_dtype)
            z_pool = z_pool.astype(compute_dtype)
        return fused_infonce_allsteps(preds_v, z_pool, shift=shift,
                                      interpret=interpret)

    B, Tp, K, D = preds_v.shape
    C, T, _ = z_pool.shape
    if compute_dtype is not None:
        preds_v = preds_v.astype(compute_dtype)
        z_pool = z_pool.astype(compute_dtype)
    preds_t = preds_v.transpose(1, 2, 0, 3)  # (Tp, K, B, D)
    z_t = z_pool.transpose(1, 0, 2)          # (T, C, D)
    nll, correct = fused_same_step_nll(
        preds_t, z_t, jnp.asarray(shift, jnp.int32), interpret)
    mask = validity_mask(T, K, B, Tp)
    denom = Tp * B  # valid rows per k
    loss = jnp.sum(nll * mask) / (denom * K)
    acc = jnp.sum((correct * mask).reshape(T - 1, K, B), axis=(0, 2)) / denom
    return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}
