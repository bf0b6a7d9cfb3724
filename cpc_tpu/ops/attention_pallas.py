"""Causal flash attention for the transformer gar (SURVEY.md §3
"Transformer gar variant", §6.7).

At the snippet lengths the reference uses (~128 latents) plain O(T^2)
attention is fine and `models/transformer.py` keeps XLA's fused softmax as
the default. The context-scaling study (RESULTS.md runs 3-5) is exactly the
regime where that stops being true: at T = 1024 a (B=32, H=8) layer
materializes B*H*T^2 = 268M scores per layer per direction, and the next
doubling puts the transformer family out of reach while the GRU family keeps
going. This kernel applies the same streaming-softmax structure the repo
already uses for the InfoNCE pool (`ops/infonce_allsteps_pallas.py` — the
flash trick on the contrastive loss) to the attention matrix itself, so the
transformer gar rides the context lever too:

  forward:  grid (B*H, q_tiles, k_tiles), k fastest. Running max m, sum l,
            and the (QT, Dh) output accumulator live in VMEM scratch across
            the k sweep (online softmax); out and the log-sum-exp residual
            are written at the last k tile. Tiles strictly above the causal
            diagonal are skipped (`pl.when`), not just masked.
  backward: two kernels sharing the saved lse (scores recomputed per tile,
            never materialized):
              dQ:  grid (BH, q, k) k-fastest,  dQ_r  = sum_k  dS @ K_tile
              dKV: grid (BH, k, q) q-fastest,  dV_c  = sum_q  P^T @ dO_tile,
                                               dK_c  = sum_q  dS^T @ Q_tile
            with dS = P * (dO V^T - rowsum(dO*O)) * scale, the standard
            flash-attention backward identity; rowsum(dO*O) is a cheap
            elementwise reduction done in jnp outside the kernel.

Layout: heads are folded into the grid's leading dim (attention never mixes
them); T is padded to the 128-aligned tile, padded q rows are sliced off
(their cotangent enters the backward as zeros, and every dS term is
multiplicative in dO, so padded rows contribute exactly zero to dK/dV).
Causality guarantees every real row has at least one unmasked column (its
own), so the online softmax never sees an empty row.

Parity: tests/test_pallas_attention.py vs a jnp reference and vs the flax
MHA path at the module level, fwd and grads, interpret mode on CPU and
compiled on the real chip (commit log).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _tiles(T: int) -> Tuple[int, int]:
    """(T_pad, tile): 128-wide tiles once T outgrows one tile, else one
    8-aligned tile (Mosaic: last-two block dims 8/128-divisible or equal to
    the array dims — a single tile IS the array dim)."""
    if T > 128:
        tile = 128
        return -(-T // tile) * tile, tile
    t_pad = max(8, -(-T // 8) * 8)
    return t_pad, t_pad


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, QT: int, KT: int, T: int, scale: float, p_dtype: str):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:, :] = jnp.full_like(m_scr, _NEG)
        l_scr[:, :] = jnp.zeros_like(l_scr)
        acc_scr[:, :] = jnp.zeros_like(acc_scr)

    row0 = pl.program_id(1) * QT
    col0 = ki * KT

    # tiles strictly above the causal diagonal contribute nothing — skip
    @pl.when(col0 <= row0 + QT - 1)
    def _():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (QT, KT)
        rows = jax.lax.broadcasted_iota(jnp.int32, (QT, KT), 0) + row0
        cols = jax.lax.broadcasted_iota(jnp.int32, (QT, KT), 1) + col0
        s = jnp.where((cols <= rows) & (cols < T), s, _NEG)

        m_old = m_scr[:, 0]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        corr = jnp.exp(m_old - m_new)
        l_scr[:, 0] = l_scr[:, 0] * corr + jnp.sum(p, axis=-1)
        pd = jnp.dtype(p_dtype)
        acc_scr[:, :] = acc_scr[:, :] * corr[:, None] + jax.lax.dot_general(
            p.astype(pd), v_ref[0].astype(pd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, 0] = m_new

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_scr[:, :] / l_scr[:, 0][:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, 0, :] = m_scr[:, 0] + jnp.log(l_scr[:, 0])


def _recompute_p(q_ref, k_ref, lse_ref, row0, col0, QT, KT, T, scale):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (QT, KT), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (QT, KT), 1) + col0
    s = jnp.where((cols <= rows) & (cols < T), s, _NEG)
    return jnp.exp(s - lse_ref[0, 0, 0, :][:, None])  # (QT, KT)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dres_ref, dq_ref, acc,
               *, QT: int, KT: int, T: int, scale: float, p_dtype: str):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    row0 = pl.program_id(1) * QT
    col0 = ki * KT

    @pl.when(col0 <= row0 + QT - 1)
    def _():
        pd = jnp.dtype(p_dtype)
        p = _recompute_p(q_ref, k_ref, lse_ref, row0, col0, QT, KT, T, scale)
        dp = jax.lax.dot_general(  # dO V^T (QT, KT)
            do_ref[0].astype(pd), v_ref[0].astype(pd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dres_ref[0, 0, 0, :][:, None]) * scale
        acc[:, :] += jax.lax.dot_general(
            ds.astype(pd), k_ref[0].astype(pd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc[:, :].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dres_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, QT: int, KT: int, T: int, scale: float, p_dtype: str):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:, :] = jnp.zeros_like(dk_acc)
        dv_acc[:, :] = jnp.zeros_like(dv_acc)

    row0 = qi * QT
    col0 = pl.program_id(1) * KT

    @pl.when(col0 <= row0 + QT - 1)
    def _():
        pd = jnp.dtype(p_dtype)
        p = _recompute_p(q_ref, k_ref, lse_ref, row0, col0, QT, KT, T, scale)
        do = do_ref[0].astype(pd)
        dv_acc[:, :] += jax.lax.dot_general(  # P^T dO (KT, Dh)
            p.astype(pd), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0].astype(pd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dres_ref[0, 0, 0, :][:, None]) * scale
        dk_acc[:, :] += jax.lax.dot_general(  # dS^T Q (KT, Dh)
            ds.astype(pd), q_ref[0].astype(pd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:, :].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:, :].astype(dv_ref.dtype)


def _pad_t(x, t_pad):
    T = x.shape[1]
    return x if T == t_pad else jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, interpret, p_dtype):
    """(BH, T, Dh) q/k/v -> (BH, T, Dh) causal attention output."""
    o, _ = _flash_fwd(q, k, v, scale, interpret, p_dtype)
    return o


def _flash_fwd(q, k, v, scale, interpret, p_dtype):
    BH, T, Dh = q.shape
    t_pad, tile = _tiles(T)
    qp, kp, vp = (_pad_t(x, t_pad) for x in (q, k, v))
    n_tiles = t_pad // tile
    grid = (BH, n_tiles, n_tiles)
    kern = functools.partial(_fwd_kernel, QT=tile, KT=tile, T=T, scale=scale,
                             p_dtype=p_dtype)
    qkv_spec = [
        pl.BlockSpec((1, tile, Dh), lambda b, r, c: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, Dh), lambda b, r, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, Dh), lambda b, r, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
    ]
    o, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=qkv_spec,
        out_specs=[
            pl.BlockSpec((1, tile, Dh), lambda b, r, c: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile), lambda b, r, c: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((BH, t_pad, Dh), q.dtype),
            jax.ShapeDtypeStruct((BH, n_tiles, 1, tile), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, 1), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
            pltpu.VMEM((tile, Dh), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # ~half the rectangle survives the causal skip
            flops=2 * BH * t_pad * t_pad * Dh,
            bytes_accessed=q.dtype.itemsize * 3 * BH * t_pad * Dh * n_tiles,
            transcendentals=BH * t_pad * t_pad // 2,
        ),
    )(qp, kp, vp)
    return o[:, :T], (q, k, v, lse)


def _flash_fwd_rule(q, k, v, scale, interpret, p_dtype):
    o, res = _flash_fwd(q, k, v, scale, interpret, p_dtype)
    return o, res + (o,)


def _flash_bwd_rule(scale, interpret, p_dtype, res, g):
    q, k, v, lse, o = res
    BH, T, Dh = q.shape
    t_pad, tile = _tiles(T)
    n_tiles = t_pad // tile
    qp, kp, vp = (_pad_t(x, t_pad) for x in (q, k, v))
    gp = _pad_t(g, t_pad)  # zeros for padded rows -> they contribute nothing
    # rowsum(dO * O): elementwise, cheap — jnp, not a kernel
    dres = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dres = _pad_t(dres[..., None], t_pad)[..., 0]
    dres = dres.reshape(BH, n_tiles, 1, tile)

    common = dict(QT=tile, KT=tile, T=T, scale=scale, p_dtype=p_dtype)
    row_spec = pl.BlockSpec((1, tile, Dh), lambda b, r, c: (b, r, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, tile, Dh), lambda b, r, c: (b, c, 0),
                            memory_space=pltpu.VMEM)
    res_spec = pl.BlockSpec((1, 1, 1, tile), lambda b, r, c: (b, r, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(BH, n_tiles, n_tiles),
        in_specs=[row_spec, col_spec, col_spec, row_spec, res_spec, res_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((BH, t_pad, Dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((tile, Dh), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, dres)

    # swapped grid: cols outer, rows (the reduction) fastest
    row_spec_s = pl.BlockSpec((1, tile, Dh), lambda b, c, r: (b, r, 0),
                              memory_space=pltpu.VMEM)
    col_spec_s = pl.BlockSpec((1, tile, Dh), lambda b, c, r: (b, c, 0),
                              memory_space=pltpu.VMEM)
    res_spec_s = pl.BlockSpec((1, 1, 1, tile), lambda b, c, r: (b, r, 0, 0),
                              memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid=(BH, n_tiles, n_tiles),
        in_specs=[row_spec_s, col_spec_s, col_spec_s, row_spec_s,
                  res_spec_s, res_spec_s],
        out_specs=[col_spec_s, col_spec_s],
        out_shape=(jax.ShapeDtypeStruct((BH, t_pad, Dh), k.dtype),
                   jax.ShapeDtypeStruct((BH, t_pad, Dh), v.dtype)),
        scratch_shapes=[pltpu.VMEM((tile, Dh), jnp.float32)] * 2,
        interpret=interpret,
    )(qp, kp, vp, gp, lse, dres)

    return dq[:, :T], dk[:, :T], dv[:, :T]


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_causal_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                     scale: float | None = None,
                     interpret: bool = False,
                     p_dtype: str = "float32") -> jnp.ndarray:
    """Causal multi-head attention, O(T) memory in the scores.

    q/k/v: (B, T, H, Dh) (the flax DenseGeneral head layout). Returns
    (B, T, H, Dh). scale defaults to Dh**-0.5 (applied to the scores in
    fp32, numerically equivalent to flax's query/sqrt(Dh) pre-scaling).

    p_dtype: input dtype for the five post-softmax matmuls (PV forward;
    dO·Vᵀ, dS·K, Pᵀ·dO, dSᵀ·Q backward). The QKᵀ scores, the online-softmax
    statistics, and every accumulator stay float32 regardless. 'bfloat16'
    feeds those MXU ops at the 2× bf16 issue rate (ar.attn_impl='flash16');
    'float32' (default) is the exact-parity setting.
    """
    B, T, H, Dh = q.shape
    if scale is None:
        scale = float(Dh) ** -0.5
    interpret = interpret or jax.default_backend() != "tpu"

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)

    o = _flash(fold(q), fold(k), fold(v), scale, interpret, p_dtype)
    return o.reshape(B, H, T, Dh).transpose(0, 2, 1, 3)
