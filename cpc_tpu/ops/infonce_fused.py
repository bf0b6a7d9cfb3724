"""Fully-fused heads+InfoNCE loss: c -> loss without materializing preds in
exotic layouts (SURVEY.md §2 N2, §8.4; VERDICT r1 next-step #2b).

The round-1 pipeline was: heads matmul (B,T,A)@(A,KD) -> reshape ->
valid-window slice -> transpose to (Tp,K,B,D) -> Pallas kernel -> backward
un-permute gather of a (T-1, K*B, D) fp32 tensor. The copies around the
kernel (slice + 100 MB transpose fwd, 200 MB gather bwd) cost more than the
scores themselves.

This module keeps the heads matmul in XLA — where a (T*B, A)@(A, K*D)
matmul is already MXU-optimal — but emits it TIME-MAJOR FLAT, p (T, B, K*D),
which the kernel can consume directly:

  * the K prediction blocks for target step tau are p[tau-1-k, :, kD:(k+1)D]
    — expressible as K narrow (1, B, D) block specs with index maps
    (clip(tau-1-k), 0, k). No transpose, no valid-window slice (the validity
    mask already handles edge rows), no regrouping of any kind.
  * backward writes dp as K separate tau-indexed (T, B, D) arrays (row tau =
    cotangent of prediction t = tau-1-k; out-of-window rows are exact zeros
    via the validity mask) and the caller slices rows [1+k, 1+k+Tp) to
    recover t-indexing. XLA then folds them straight into
    dc = sum_k dp_k @ W_k^T and dW_k = c^T @ dp_k — plain matmuls, no
    gathers. Forward and backward grids are both G-tiled (G target steps per
    program) to amortize the ~3 us/program Mosaic dispatch cost.

Semantics match cpc_tpu.ops.infonce exactly (same_step negatives,
cross-replica shift): preds[t, k] = c[t] @ W[:, kD:(k+1)D] scores against
z[tau = t+k+1] over the C-way candidate pool, positives at shift + b.

VMEM: the score tile is (K*B, C) fp32; the theoretical bound with K=12 is
C (global candidate batch) ~1024 per 16 MB core (`_C_LIMIT`), but the
MEASURED v5e envelope is C <= 128 (C=192 fails the scoped-vmem compile,
C=512 compile did not finish — docs/DESIGN.md "the last millisecond").
A trace-time warning fires above 128; use cpc_tpu.ops.infonce_pallas
(K-tiled) via loss.fuse_heads=False beyond the envelope.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C_LIMIT = 1024  # score tile (K*B, C) fp32 must fit VMEM

# Largest candidate pool at which this kernel MEASURABLY compiles and wins
# on v5e (C=128 ~2 min compile, OK; C=192 scoped-vmem compile OOM; C=512
# remote compile did not finish in 15 min — docs/DESIGN.md). make_step_fns
# auto-selects the K-tiled kernel above this instead of warning-then-crash.
MEASURED_C_ENVELOPE = 128


def validity_mask_tm(T: int, K: int, B: int, Tp: int) -> jnp.ndarray:
    """(T, K*B) fp32 mask for the kernel's tau-indexed flat output."""
    tau = jnp.arange(T)[:, None]
    rows = jnp.arange(K * B)[None, :]
    t = tau - 1 - rows // B
    return jnp.logical_and(t >= 0, t < Tp).astype(jnp.float32)


def _rows(K: int, B: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (K * B, 1), 0)[:, 0]
    return rows // B, rows % B  # (k_of_row, i_of_row)


def _fwd_kernel(shift_ref, *refs, K: int, B: int, C: int, G: int):
    """G target steps per program (amortizes the ~3 us/program Mosaic cost):
    program i handles tau = G*i + g for g in [0, G). The (g, k) prediction
    block p[tau-1-k, :, kD:(k+1)D] arrives in ref g*K + k; tau = 0 rows are
    edge garbage the caller masks."""
    p_refs = refs[:G * K]
    z_ref = refs[G * K]
    nll_ref, cor_ref = refs[G * K + 1], refs[G * K + 2]

    _, i_of_row = _rows(K, B)
    labels = shift_ref[0] + i_of_row
    cols = jax.lax.broadcasted_iota(jnp.int32, (K * B, C), 1)
    for g in range(G):
        z = z_ref[g]
        p_eff = jnp.concatenate(
            [p_refs[g * K + k][0] for k in range(K)], axis=0)
        s = jax.lax.dot_general(
            p_eff, z, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (K*B, C)
        m = jnp.max(s, axis=-1, keepdims=True)
        lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(s - m), axis=-1))
        s_lab = jnp.sum(jnp.where(cols == labels[:, None], s, 0.0), axis=-1)
        nll_ref[g, 0, :] = lse - s_lab
        cor_ref[g, 0, :] = (jnp.argmax(s, axis=-1) == labels
                            ).astype(jnp.float32)


def _bwd_kernel(shift_ref, *refs, K: int, B: int, C: int, Tp: int, G: int):
    """G target steps per program (same amortization as the forward).
    Outputs are tau-indexed: dz row tau, and dp_k row tau = the cotangent of
    prediction (t = tau-1-k, head k) — the caller shifts each dp_k back to
    t-indexing with a static slice. Rows whose (t, k) is out of window get
    delta = 0 (the validity mask), so tau = 0 and edge rows are exact zeros,
    not garbage: no clamped-write ordering tricks needed."""
    g_ref = refs[0]
    p_refs, z_ref = refs[1:G * K + 1], refs[G * K + 1]
    dz_ref = refs[G * K + 2]
    dp_refs = refs[G * K + 3:]

    k_of_row, i_of_row = _rows(K, B)
    labels = shift_ref[0] + i_of_row
    cols = jax.lax.broadcasted_iota(jnp.int32, (K * B, C), 1)
    for g in range(G):
        tau = pl.program_id(0) * G + g
        z = z_ref[g]
        p_eff = jnp.concatenate(
            [p_refs[g * K + k][0] for k in range(K)], axis=0)
        s = jax.lax.dot_general(
            p_eff, z, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        soft = e / jnp.sum(e, axis=-1, keepdims=True)
        delta = soft - (cols == labels[:, None]).astype(jnp.float32)
        t_of_row = tau - 1 - k_of_row
        valid = jnp.logical_and(t_of_row >= 0,
                                t_of_row < Tp).astype(jnp.float32)
        delta = delta * (g_ref[g, 0, :] * valid)[:, None]

        dz_ref[g] = jax.lax.dot_general(  # (C, K*B) x (K*B, D)
            delta, p_eff.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dz_ref.dtype)

        dp = jax.lax.dot_general(  # (K*B, C) x (C, D)
            delta, z.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for k in range(K):
            dp_refs[k][g] = dp[k * B:(k + 1) * B].astype(dp_refs[k].dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _heads_nll(c_tm, z_tm, W, shift, K: int, interpret: bool):
    """c_tm (T, B, A), z_tm (T, C, D), W (A, K*D), shift () int32 ->
    (nll (T, K*B) fp32, correct (T, K*B) fp32), row tau = target step.
    Edge rows (tau = 0 and out-of-window (t, k)) are garbage — reduce with
    validity_mask_tm."""
    out, _ = _fwd_rule(c_tm, z_tm, W, shift, K, interpret)
    return out


def _choose_g(T: int, K: int, B: int, C: int, D: int, itemsize: int) -> int:
    """Largest G in {8, 4, 2, 1} dividing T whose double-buffered tile fits
    the VMEM budget."""
    budget = 9 * 1024 * 1024
    for g in (8, 4, 2, 1):
        if T % g:
            continue
        est = (2 * g * K * B * D * itemsize      # p blocks, double-buffered
               + 2 * g * C * D * itemsize        # z tile
               + 4 * K * B * C * 4               # score temporaries
               + 2 * g * K * B * 4 * 2)          # out blocks
        if est <= budget:
            return g
    return 1


def _pallas_fwd(p, z_tm, shift, K, interpret):
    T, B, KD = p.shape
    D = KD // K
    _, C, _ = z_tm.shape
    G = _choose_g(T, K, B, C, D, p.dtype.itemsize)

    def p_map(g, k):
        def index_map(ti, shift_ref):
            return (jnp.clip(ti * G + g - 1 - k, 0, T - 1), 0, k)
        return index_map

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // G,),
        in_specs=[
            *[pl.BlockSpec((1, B, D), p_map(g, k), memory_space=pltpu.VMEM)
              for g in range(G) for k in range(K)],
            pl.BlockSpec((G, C, D), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, 1, K * B), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, K * B), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    nll3, cor3 = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, B=B, C=C, G=G),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, K * B), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, K * B), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * K * B * C * D,
            bytes_accessed=2 * T * (K * B * D + C * D + 4 * K * B),
            transcendentals=T * K * B * C,
        ),
    )(jnp.asarray([shift], jnp.int32), *([p] * (G * K)), z_tm)
    return nll3[:, 0, :], cor3[:, 0, :]


def _fwd_rule(c_tm, z_tm, W, shift, K, interpret):
    T, B, A = c_tm.shape
    KD = W.shape[-1]
    p = (c_tm.reshape(T * B, A) @ W).reshape(T, B, KD)
    out = _pallas_fwd(p, z_tm, shift, K, interpret)
    return out, (c_tm, z_tm, W, p, shift)


def _choose_g_bwd(T: int, K: int, B: int, C: int, D: int,
                  itemsize: int) -> int:
    """Largest G in {4, 2, 1} dividing T whose double-buffered backward tile
    set fits the VMEM budget. The backward carries the dp outputs on top of
    the forward's tiles, so its budget is tighter than the forward's."""
    budget = 8 * 1024 * 1024
    for g in (4, 2, 1):
        if T % g:
            continue
        est = (2 * g * K * B * D * itemsize   # p blocks, double-buffered
               + 2 * g * C * D * itemsize     # z tile
               + 2 * g * C * D * 4            # dz out (fp32)
               + 2 * g * K * B * D * itemsize  # dp outs
               + 4 * K * B * C * 4)           # score/softmax temporaries
        if est <= budget:
            return g
    return 1


def _bwd_rule(K, interpret, res, cots):
    c_tm, z_tm, W, p, shift = res
    g_nll, _g_cor = cots  # accuracy is argmax: non-differentiable
    T, B, A = c_tm.shape
    _, C, D = z_tm.shape
    Tp = T - K
    G = _choose_g_bwd(T, K, B, C, D, p.dtype.itemsize)

    def p_map(g, k):
        def index_map(ti, shift_ref):
            return (jnp.clip(ti * G + g - 1 - k, 0, T - 1), 0, k)
        return index_map

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec((G, 1, K * B), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, B, D), p_map(g, k), memory_space=pltpu.VMEM)
              for g in range(G) for k in range(K)],
            pl.BlockSpec((G, C, D), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, C, D), lambda ti, s: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            # dp_k is tau-indexed (row tau = cotangent of prediction
            # t = tau-1-k); out-of-window rows are exact zeros via the
            # validity mask, and the caller slices rows [1+k, 1+k+Tp) to
            # recover t-indexing — no clamped-write ordering tricks.
            *[pl.BlockSpec((G, B, D), lambda ti, s: (ti, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(K)],
        ],
    )
    wire = p.dtype
    dz, *dps = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, B=B, C=C, Tp=Tp, G=G),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, C, D), jnp.float32),
            *[jax.ShapeDtypeStruct((T, B, D), wire) for _ in range(K)],
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * T * K * B * C * D,
            bytes_accessed=2 * T * (2 * K * B * D + 2 * C * D),
            transcendentals=T * K * B * C,
        ),
    )(jnp.asarray([shift], jnp.int32),
      g_nll.astype(jnp.float32).reshape(T, 1, K * B),
      *([p] * (G * K)), z_tm)
    dz = dz.astype(z_tm.dtype)  # row tau=0 is exact zeros (masked in-kernel)

    c_v = c_tm[:Tp].reshape(Tp * B, A)
    dc_v = jnp.zeros((Tp * B, A), jnp.float32)
    dW_cols = []
    for k in range(K):
        dp_k = dps[k][1 + k:1 + k + Tp].reshape(Tp * B, D)
        W_k = W[:, k * D:(k + 1) * D]
        dc_v = dc_v + jax.lax.dot_general(
            dp_k, W_k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dW_cols.append(jax.lax.dot_general(
            c_v, dp_k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dc = jnp.zeros((T, B, A), c_tm.dtype).at[:Tp].set(
        dc_v.reshape(Tp, B, A).astype(c_tm.dtype))
    dW = jnp.concatenate(dW_cols, axis=1).astype(W.dtype)
    return dc, dz, dW, None


_heads_nll.defvjp(_fwd_rule, _bwd_rule)


def fused_heads_infonce(
    c: jnp.ndarray,      # (B, T, A) context — or (T, B, A) if c_time_major
    z: jnp.ndarray,      # (B, T, D) encoder latents
    W: jnp.ndarray,      # (A, K*D) fused prediction-heads weight
    *,
    num_steps: int,
    axis_name=None,
    compute_dtype=None,
    interpret: bool = False,
    c_time_major: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Loss + per-k accuracy straight from (c, z, W) — same semantics as
    infonce_loss_and_metrics(preds=heads(c), z, negatives='same_step',
    axis_name=...), but preds never exists in HBM in any layout other than
    the heads matmul's natural output.

    c_time_major: c is already (T, B, A) — CPCModel.latents_tm hands the
    GRU's native scan layout straight through, cancelling the transpose
    pair at the model/loss boundary."""
    interpret = interpret or jax.default_backend() != "tpu"
    if c_time_major:
        T, B, A = c.shape
    else:
        B, T, A = c.shape
    D = z.shape[-1]
    K = num_steps
    Tp = T - K
    if Tp <= 0:
        raise ValueError(
            f"sequence of {T} latents is too short for K={K} offsets")
    if compute_dtype is not None:
        c = c.astype(compute_dtype)
        z = z.astype(compute_dtype)
        W = W.astype(compute_dtype)
    c_tm = c if c_time_major else c.transpose(1, 0, 2)  # (T, B, A)
    z_loc = z.transpose(1, 0, 2)  # (T, B, D)
    if axis_name is not None:
        # tiled gather along the candidate axis: (T, R*B, D), no re-layout
        z_tm = jax.lax.all_gather(z_loc, axis_name, axis=1, tiled=True)
        shift = jax.lax.axis_index(axis_name) * B
    else:
        z_tm, shift = z_loc, 0
    C = z_tm.shape[1]
    if C > _C_LIMIT and not interpret:
        raise ValueError(
            f"global candidate pool C={C} exceeds the (K*B, C) fp32 VMEM "
            f"tile budget ({_C_LIMIT}); use loss.fuse_heads=False (the "
            f"K-tiled cpc_tpu.ops.infonce_pallas path) for this config")
    if C > 128 and not interpret:
        import warnings
        warnings.warn(
            f"fused heads+InfoNCE with candidate pool C={C}: the measured "
            "v5e envelope is C<=128 (C=192 fails scoped-vmem compile, "
            "C=512 compile did not finish — docs/DESIGN.md); if compilation "
            "fails or stalls, set loss.fuse_heads=False",
            stacklevel=2)
    nll, correct = _heads_nll(c_tm, z_tm, W,
                              jnp.asarray(shift, jnp.int32), K, interpret)
    mask = validity_mask_tm(T, K, B, Tp)
    denom = Tp * B
    loss = jnp.sum(nll * mask) / (denom * K)
    acc = jnp.sum((correct * mask).reshape(T, K, B), axis=(0, 2)) / denom
    return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}
