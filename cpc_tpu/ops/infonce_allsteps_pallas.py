"""Fused all-steps InfoNCE: flash-style streaming softmax-CE over the FULL
candidate pool (SURVEY.md §6.7, §8.4).

In 'all_steps' mode every (t, k, i) prediction scores against ALL B*T
latents (same sequence at other steps + other sequences — the CPC-paper
negative pool). The score matrix is (B*Tp*K) x (B*T) and grows quadratically
with batch x snippet length; the jnp path materializes it. This kernel never
does:

  forward:  grid (row_tiles, col_tiles), col-fastest. Running max m, sum l,
            positive score s_lab, and argmax live in VMEM scratch across the
            col sweep (online softmax); NLL = m + log(l) - s_lab and the
            argmax-correct flag are written at the last col tile. The
            log-sum-exp is saved as a residual (flash-attention style).
  backward: two kernels sharing the saved lse —
            dP: grid (rows, cols) col-fastest, dP_r = sum_tiles
                (softmax - onehot) @ Z_tile, accumulated in scratch;
            dZ: grid (cols, rows) row-fastest, dZ_n = sum_tiles
                (softmax - onehot)^T @ P_tile, accumulated in scratch.
            Softmax is recomputed per tile from the residual lse.

Row layout: r = (t*K + k)*B + i (matches the (Tp, K, B) reduction layout of
the same-step kernel); candidate column n = c*T + tau, i.e. z.reshape(C*T, D)
verbatim. The positive column for row r is (shift + i)*T + (t + k + 1),
computed in-kernel from iota. Rows are padded to the row-tile multiple
(padded rows masked by the caller's reduction; their cotangent is zero), and
out-of-range columns are masked to -1e30 inside the kernel.

Parity: tests/test_pallas_infonce.py::test_allsteps_* vs the jnp reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _row_meta(r0, RT: int, B: int, K: int, T: int, shift):
    """For rows [r0, r0+RT): their positive column index."""
    r = jax.lax.broadcasted_iota(jnp.int32, (RT, 1), 0)[:, 0] + r0
    i = r % B
    tk = r // B
    k = tk % K
    t = tk // K
    return (shift + i) * T + (t + k + 1)


def _fwd_kernel(shift_ref, p_ref, z_ref, nll_ref, cor_ref, lse_ref,
                m_scr, l_scr, lab_scr, amax_scr, aidx_scr,
                *, RT: int, CT: int, B: int, K: int, T: int, N: int):
    ri = pl.program_id(0)
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        m_scr[:, :] = jnp.full_like(m_scr, _NEG)
        l_scr[:, :] = jnp.zeros_like(l_scr)
        lab_scr[:, :] = jnp.zeros_like(lab_scr)
        amax_scr[:, :] = jnp.full_like(amax_scr, _NEG)
        aidx_scr[:, :] = jnp.zeros_like(aidx_scr)

    s = jax.lax.dot_general(
        p_ref[:, :], z_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (RT, CT)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RT, CT), 1) + ci * CT
    s = jnp.where(cols < N, s, _NEG)

    labels = _row_meta(ri * RT, RT, B, K, T, shift_ref[0])
    lab_scr[:, 0] += jnp.sum(jnp.where(cols == labels[:, None], s, 0.0),
                             axis=-1)

    tile_max = jnp.max(s, axis=-1)
    tile_arg = jnp.argmax(s, axis=-1).astype(jnp.int32) + ci * CT
    better = tile_max > amax_scr[:, 0]
    amax_scr[:, 0] = jnp.where(better, tile_max, amax_scr[:, 0])
    aidx_scr[:, 0] = jnp.where(better, tile_arg, aidx_scr[:, 0])

    m_old = m_scr[:, 0]
    m_new = jnp.maximum(m_old, tile_max)
    l_scr[:, 0] = (l_scr[:, 0] * jnp.exp(m_old - m_new)
                   + jnp.sum(jnp.exp(s - m_new[:, None]), axis=-1))
    m_scr[:, 0] = m_new

    @pl.when(ci == pl.num_programs(1) - 1)
    def _():
        lse = m_scr[:, 0] + jnp.log(l_scr[:, 0])
        nll_ref[0, 0, :] = lse - lab_scr[:, 0]
        cor_ref[0, 0, :] = (aidx_scr[:, 0] == labels).astype(jnp.float32)
        lse_ref[0, 0, :] = lse


def _dp_kernel(shift_ref, g_ref, lse_ref, p_ref, z_ref, dp_ref, acc,
               *, RT: int, CT: int, B: int, K: int, T: int, N: int,
               grad_bf16: bool):
    ri = pl.program_id(0)
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        p_ref[:, :], z_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RT, CT), 1) + ci * CT
    s = jnp.where(cols < N, s, _NEG)
    soft = jnp.exp(s - lse_ref[0, 0, :][:, None])
    labels = _row_meta(ri * RT, RT, B, K, T, shift_ref[0])
    delta = soft - (cols == labels[:, None]).astype(jnp.float32)
    delta = delta * g_ref[0, 0, :][:, None]
    # bf16 wire -> the second matmul's operands both ride the MXU's 2x bf16
    # issue rate (delta in [-1, 1] rounds at bf16's ~3 decimal digits; the
    # fp32 parity configuration keeps the exact fp32 path). Accumulation is
    # fp32 either way via preferred_element_type.
    if grad_bf16:
        delta = delta.astype(jnp.bfloat16)
        z_op = z_ref[:, :]
    else:
        z_op = z_ref[:, :].astype(jnp.float32)
    acc[:, :] += jax.lax.dot_general(
        delta, z_op,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ci == pl.num_programs(1) - 1)
    def _():
        dp_ref[0] = acc[:, :]


def _dz_kernel(shift_ref, g_ref, lse_ref, p_ref, z_ref, dz_ref, acc,
               *, RT: int, CT: int, B: int, K: int, T: int, N: int,
               grad_bf16: bool):
    ci = pl.program_id(0)
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        p_ref[:, :], z_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RT, CT), 1) + ci * CT
    s = jnp.where(cols < N, s, _NEG)
    soft = jnp.exp(s - lse_ref[0, 0, :][:, None])
    labels = _row_meta(ri * RT, RT, B, K, T, shift_ref[0])
    delta = soft - (cols == labels[:, None]).astype(jnp.float32)
    delta = delta * g_ref[0, 0, :][:, None]
    if grad_bf16:
        delta = delta.astype(jnp.bfloat16)
        p_op = p_ref[:, :]
    else:
        p_op = p_ref[:, :].astype(jnp.float32)
    acc[:, :] += jax.lax.dot_general(  # (CT, RT) x (RT, D)
        delta, p_op,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ri == pl.num_programs(1) - 1)
    def _():
        dz_ref[0] = acc[:, :]


def _tiles(R: int, N: int, D: int = 512):
    """Row/col tile sizes. Chip-swept r5 (docs/DESIGN.md "the all-steps perf
    pass"): the r1-r4 (256, 512) tiles put ~23k programs on the grid at the
    study shapes (R~187k-384k, N=16-32k) and the per-program Mosaic cost
    plus per-program z-tile streaming held the forward to ~69 TF/s (39% of
    the chained-matmul roofline). (512, 4096) — the largest tile Mosaic
    compiles at D=512 (8 MB fp32 score block; (512, 8192) and (1024, 2048)
    fail remote compile) — measured fwd 180.5->90.4 ms and fwd+bwd
    514.9->361.8 ms at the 5.12 s study shape (1.42x; forward ~142 TF/s =
    80% of roofline, and the 5-pass fwd+bwd totals ~178 TF/s — AT the
    measured chained-matmul roofline, so further gains need fewer passes,
    not better tiles). CT clamps to N's 128-padded size so small pools
    don't sweep padding, and the 4096 budget is D=512-measured: the
    backward dZ accumulator is a (CT, D) fp32 VMEM block, so wider d_enc
    scales the budget down proportionally (unmeasured widths get the
    conservative scaling, not the measured point). Overridable for sweeps
    via CPC_ALLSTEPS_RT / CPC_ALLSTEPS_CT (benchmarks/exp_allsteps.py
    --sweep).
    """
    import os
    rt_env = int(os.environ.get("CPC_ALLSTEPS_RT", 0))
    ct_env = int(os.environ.get("CPC_ALLSTEPS_CT", 0))
    RT = rt_env or (512 if R >= 512 else max(8, -(-R // 8) * 8))
    budget = max(512, 4096 * 512 // max(D, 512) // 128 * 128)
    CT = ct_env or min(budget, max(128, -(-N // 128) * 128))
    return min(RT, -(-R // 8) * 8), CT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def allsteps_nll(p_flat, z_flat, shift, B, K, T, interpret=False):
    """p_flat (R_pad, D) rows in (t, k, i) order, z_flat (N, D) = z.reshape.
    Returns (nll (R_pad,), correct (R_pad,)); padded rows hold garbage."""
    nll, cor, _ = _fwd(p_flat, z_flat, shift, B, K, T, interpret)
    return nll, cor


def _fwd(p_flat, z_flat, shift, B, K, T, interpret):
    R_pad, D = p_flat.shape
    N, _ = z_flat.shape
    RT, CT = _tiles(R_pad, N, D)
    assert R_pad % RT == 0
    N_pad = -(-N // CT) * CT
    if N_pad != N:
        z_flat = jnp.pad(z_flat, ((0, N_pad - N), (0, 0)))
    grid = (R_pad // RT, N_pad // CT)
    kern = functools.partial(_fwd_kernel, RT=RT, CT=CT, B=B, K=K, T=T, N=N)
    nll, cor, lse = pl.pallas_call(
        kern,
        # rows are independent; the col sweep carries the online-softmax
        # scratch state, so it must stay sequential ('arbitrary')
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RT, D), lambda r, c, s: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CT, D), lambda r, c, s: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, RT), lambda r, c, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, RT), lambda r, c, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, RT), lambda r, c, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((RT, 1), jnp.float32)] * 4
            + [pltpu.VMEM((RT, 1), jnp.int32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R_pad // RT, 1, RT), jnp.float32),
            jax.ShapeDtypeStruct((R_pad // RT, 1, RT), jnp.float32),
            jax.ShapeDtypeStruct((R_pad // RT, 1, RT), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * R_pad * N_pad * D,
            bytes_accessed=4 * (R_pad * D * (N_pad // CT) + N_pad * D),
            transcendentals=R_pad * N_pad,
        ),
    )(jnp.asarray([shift], jnp.int32), p_flat, z_flat)
    return nll.reshape(-1), cor.reshape(-1), lse


def _fwd_rule(p_flat, z_flat, shift, B, K, T, interpret):
    nll, cor, lse = _fwd(p_flat, z_flat, shift, B, K, T, interpret)
    return (nll, cor), (p_flat, z_flat, shift, lse)


def _bwd_rule(B, K, T, interpret, res, cots):
    p_flat, z_flat, shift, lse = res
    g_nll, _ = cots
    R_pad, D = p_flat.shape
    N, _ = z_flat.shape
    RT, CT = _tiles(R_pad, N, D)
    N_pad = -(-N // CT) * CT
    z_padded = jnp.pad(z_flat, ((0, N_pad - N), (0, 0))) if N_pad != N \
        else z_flat
    g2 = g_nll.astype(jnp.float32).reshape(R_pad // RT, 1, RT)
    lse2 = lse.reshape(R_pad // RT, 1, RT)
    # bf16 wire in -> bf16 second-matmul operands (the production
    # pallas_bf16 path); fp32 in (the parity configuration) keeps the exact
    # fp32 grads. CPC_ALLSTEPS_GRAD_BF16=0/1 overrides for A/B sweeps.
    import os
    gb_env = os.environ.get("CPC_ALLSTEPS_GRAD_BF16")
    grad_bf16 = (p_flat.dtype == jnp.bfloat16 if gb_env is None
                 else bool(int(gb_env)))
    common = dict(RT=RT, CT=CT, B=B, K=K, T=T, N=N, grad_bf16=grad_bf16)

    dp = pl.pallas_call(
        functools.partial(_dp_kernel, **common),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R_pad // RT, N_pad // CT),
            in_specs=[
                pl.BlockSpec((1, 1, RT), lambda r, c, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, RT), lambda r, c, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT, D), lambda r, c, s: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CT, D), lambda r, c, s: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, RT, D), lambda r, c, s: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((RT, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((R_pad // RT, RT, D), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([shift], jnp.int32), g2, lse2, p_flat, z_padded)

    dz = pl.pallas_call(
        functools.partial(_dz_kernel, **common),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N_pad // CT, R_pad // RT),
            in_specs=[
                pl.BlockSpec((1, 1, RT), lambda c, r, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, RT), lambda c, r, s: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT, D), lambda c, r, s: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CT, D), lambda c, r, s: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CT, D), lambda c, r, s: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((CT, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad // CT, CT, D), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([shift], jnp.int32), g2, lse2, p_flat, z_padded)

    dz = dz.reshape(N_pad, D)[:N].astype(z_flat.dtype)
    return dp.reshape(R_pad, D).astype(p_flat.dtype), dz, None


allsteps_nll.defvjp(_fwd_rule, _bwd_rule)


def fused_infonce_allsteps(
    preds_v: jnp.ndarray,  # (B, Tp, K, D)
    z_pool: jnp.ndarray,   # (C, T, D)
    *,
    shift: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Loss + per-k accuracy with the full B*T candidate pool, fused."""
    interpret = interpret or jax.default_backend() != "tpu"
    B, Tp, K, D = preds_v.shape
    C, T, _ = z_pool.shape
    R = B * Tp * K
    p_flat = preds_v.transpose(1, 2, 0, 3).reshape(R, D)
    RT, _ = _tiles(R, C * T, D)
    R_pad = -(-R // RT) * RT
    if R_pad != R:
        p_flat = jnp.pad(p_flat, ((0, R_pad - R), (0, 0)))
    z_flat = z_pool.reshape(C * T, D)

    nll, correct = allsteps_nll(p_flat, z_flat,
                                jnp.asarray(shift, jnp.int32),
                                B, K, T, interpret)
    nll, correct = nll[:R], correct[:R]
    loss = jnp.mean(nll)
    acc = jnp.mean(correct.reshape(Tp, K, B), axis=(0, 2))
    return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}
