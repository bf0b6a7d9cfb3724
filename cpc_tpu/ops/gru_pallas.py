"""Pallas GRU recurrence (SURVEY.md §2 N3, §8.4 "GRU throughput").

The reference rides cuDNN's fused GRU; the XLA lax.scan version
(cpc_tpu.models.gru) is correct but latency-bound: ~128 sequential HLO loop
iterations of a small matmul cost ~2 ms at batch 64. This kernel runs the
whole recurrence as ONE pallas_call:

  * grid = (T,); the per-step input projection block xproj[t] (B, 3H)
    streams through VMEM (Pallas prefetches block t+1 while t computes);
  * the hidden state lives in a VMEM scratch register across grid steps —
    the recurrent (B, H) x (H, 3H) matmul never leaves the core;
  * recurrent weights wh/bh use constant index maps, so they are fetched
    once and stay VMEM-resident;
  * gate math matches torch.nn.GRU exactly (r/z gates, candidate uses
    r * (Whn h + bhn)) in fp32 regardless of the wire dtype.

The backward pass is the same structure reversed (grid t = T-1..0), with
h_{t-1} taken from the forward outputs, gates recomputed flash-style, and
dwh/dbh accumulated into constant-index output blocks that live in VMEM for
the whole run. Parity vs jax.grad of the lax.scan path is tested in
tests/test_pallas_gru.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest batch at which this kernel MEASURABLY compiles on v5e: B=384 OK,
# B=512 crashes the Mosaic compile helper (r3 measurement, benchmarks/
# exp_envelope.py isolation). models.gru auto-falls back to the lax.scan
# recurrence above this — large-batch configs build without manual flags,
# matching the loss-path chooser's contract (SURVEY.md §8.4).
MEASURED_B_ENVELOPE = 384
# Same story on the WIDTH axis (r5, run-7 arm W): H=256 is the measured
# production point; H=512 at B=64 fails TPU compile with a scoped-vmem
# stack OOM (17.96M vs the 16M limit) inside the kernel's custom call.
# models.gru falls back to lax.scan above this — the d_ar width lever
# (probe_study --d-ar) must build without manual flags.
MEASURED_H_ENVELOPE = 256


def _gates(xp, hp, H: int):
    """torch GRU gate math, fp32. xp/hp: (B, 3H). Returns r, z, n, hn_lin."""
    xr, xz, xn = xp[:, :H], xp[:, H:2 * H], xp[:, 2 * H:]
    hr, hz, hn = hp[:, :H], hp[:, H:2 * H], hp[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return r, z, n, hn


def _fwd_kernel(xp_ref, wh_ref, bh_ref, h0_ref, out_ref, h_scr, *, H: int,
                U: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scr[:, :] = h0_ref[:, :].astype(jnp.float32)

    h = h_scr[:, :]
    wh = wh_ref[:, :]
    bh = bh_ref[0, :].astype(jnp.float32)
    # U recurrence steps per program: amortizes the per-grid-step pipeline
    # cost (~10us) that otherwise dwarfs the tiny recurrent matmul.
    for u in range(U):
        hp = jax.lax.dot_general(
            h.astype(wh.dtype), wh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bh
        xp = xp_ref[u].astype(jnp.float32)
        r, z, n, _ = _gates(xp, hp, H)
        h = (1.0 - z) * n + z * h
        out_ref[u] = h.astype(out_ref.dtype)
    h_scr[:, :] = h


def _bwd_kernel(xp_ref, wh_ref, bh_ref, hprev_ref, g_ref,
                dxp_ref, dwh_ref, dbh_ref, dh0_ref,
                dh_scr, *, H: int, T: int, U: int):
    i = pl.program_id(0)  # reversed block: covers t in [T-(i+1)*U, T-i*U)

    @pl.when(i == 0)
    def _():
        dh_scr[:, :] = jnp.zeros_like(dh_scr)
        dwh_ref[:, :] = jnp.zeros_like(dwh_ref)
        dbh_ref[:, :] = jnp.zeros_like(dbh_ref)

    wh = wh_ref[:, :]
    bh = bh_ref[0, :].astype(jnp.float32)
    dh = dh_scr[:, :]
    dwh_acc = jnp.zeros_like(dwh_ref)
    dbh_acc = jnp.zeros_like(dbh_ref)
    for u in range(U - 1, -1, -1):
        # hprev_ref is the pre-shifted h_{t-1} array (h0 prepended), so
        # row u is exactly h_{t-1} for this block's step u.
        h_prev = hprev_ref[u].astype(jnp.float32)
        hp = jax.lax.dot_general(
            h_prev.astype(wh.dtype), wh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bh
        xp = xp_ref[u].astype(jnp.float32)
        r, z, n, hn = _gates(xp, hp, H)

        dh = dh + g_ref[u].astype(jnp.float32)  # total dL/dh_t
        dz = dh * (h_prev - n)
        dn = dh * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dhn = dn_pre * r          # grad into (Whn h + bhn)
        dr = dn_pre * hn
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)

        dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)   # (B, 3H)
        dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=1)      # (B, 3H)

        dxp_ref[u] = dxp.astype(dxp_ref.dtype)
        dwh_acc += jax.lax.dot_general(  # (H, B) x (B, 3H)
            h_prev, dhp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbh_acc += jnp.sum(dhp, axis=0, keepdims=True)

        dh = dh * z + jax.lax.dot_general(  # (B, 3H) x (3H, H)^T
            dhp, wh.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dh_scr[:, :] = dh
    dwh_ref[:, :] += dwh_acc
    dbh_ref[:, :] += dbh_acc

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dh0_ref[:, :] = dh.astype(dh0_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_scan(xproj, wh, bh, h0, interpret=False):
    """xproj (T, B, 3H), wh (H, 3H), bh (3H,), h0 (B, H) -> hs (T, B, H).
    torch.nn.GRU semantics; gate math in fp32."""
    return _fwd(xproj, wh, bh, h0, interpret)


def _unroll(T: int) -> int:
    # Measured on v5e (B=64, H=256, T=128): U in {2, 4} minimizes the sum of
    # per-grid-step pipeline overhead and serial in-program latency.
    for u in (4, 2):
        if T % u == 0:
            return u
    return 1


def _fwd(xproj, wh, bh, h0, interpret):
    T, B, H3 = xproj.shape
    H = H3 // 3
    U = _unroll(T)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, U=U),
        grid=(T // U,),
        in_specs=[
            pl.BlockSpec((U, B, H3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((U, B, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xproj.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * H3,
            bytes_accessed=xproj.size * xproj.dtype.itemsize * 2,
            transcendentals=4 * T * B * H,
        ),
    )(xproj, wh, bh.reshape(1, H3), h0)


def _fwd_rule(xproj, wh, bh, h0, interpret):
    hs = _fwd(xproj, wh, bh, h0, interpret)
    return hs, (xproj, wh, bh, h0, hs)


def _bwd_rule(interpret, res, g):
    xproj, wh, bh, h0, hs = res
    T, B, H3 = xproj.shape
    H = H3 // 3
    U = _unroll(T)
    NB = T // U
    # pre-shifted h_{t-1} sequence keeps the reversed blocks U-aligned
    hprev = jnp.concatenate([h0[None].astype(hs.dtype), hs[:-1]], axis=0)
    dxp, dwh, dbh, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, T=T, U=U),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((U, B, H3), lambda i: (NB - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),          # xproj block
            pl.BlockSpec((H, H3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wh
            pl.BlockSpec((1, H3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # bh
            pl.BlockSpec((U, B, H), lambda i: (NB - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),          # h_{t-1} block
            pl.BlockSpec((U, B, H), lambda i: (NB - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),          # g block
        ],
        out_specs=[
            pl.BlockSpec((U, B, H3), lambda i: (NB - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),          # dxproj block
            pl.BlockSpec((H, H3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # dwh (resident)
            pl.BlockSpec((1, H3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # dbh (resident)
            pl.BlockSpec((B, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # dh0 (resident)
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H3), xproj.dtype),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H3), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * H * H3,
            bytes_accessed=xproj.size * xproj.dtype.itemsize * 4,
            transcendentals=4 * T * B * H,
        ),
    )(xproj, wh, bh.reshape(1, H3), hprev, g)
    return (dxp, dwh.astype(wh.dtype), dbh[0].astype(bh.dtype),
            dh0.astype(h0.dtype))


gru_scan.defvjp(_fwd_rule, _bwd_rule)
