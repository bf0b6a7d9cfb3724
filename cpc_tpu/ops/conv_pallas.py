"""Fused strided-conv encoder pyramid as one Pallas kernel (SURVEY.md §2 N2,
§8.4 "Strided conv as Pallas"; BASELINE.json:5 "genc ... written as fused
Pallas conv kernels").

The reference runs genc as 5 eager cuDNN convs with interleaved ReLUs
(SURVEY.md §3 "Conv encoder genc"); XLA likewise round-trips every layer's
activations through HBM (layer-1's output alone is ~270 MB bf16 at batch
64). This kernel computes the ENTIRE pyramid for a (batch row, time tile)
without intermediate HBM traffic:

  * grid = (B, TT); each program emits TZ final latents. Per-layer tile
    ranges (start = A*u + B, count c) come from the (kernel, stride,
    SAME-pad) recurrence in `plan` — all intermediates stay in VMEM;
  * layer 1 input arrives as waveform FRAMES (one (s1*r .. s1*r+k1) window
    per L1 output step), built OUTSIDE the kernel from two strided slices
    (no gather); a tile reads one block-aligned main slab plus a small halo
    slab, so the kernel needs no dynamic slicing at all;
  * every deeper conv is the "reshape-shift" matmul: with s | k, the tile
    (c_in, C) viewed as (c_in/s, s, C) exposes each stride-aligned window as
    a STATIC slice, and the layer is k accumulated (c_out, C_in) x
    (C_in, C_out) MXU matmuls in fp32 — no im2col buffer;
  * SAME-padding parity: frames cover the zero-padded waveform, and each
    layer's out-of-range halo rows are zero-masked — exactly the zeros
    flax's per-layer SAME padding feeds the next layer;
  * weights (~10 MB bf16 for the baseline spec) use constant index maps and
    stay VMEM-resident across the grid.

Differentiation: custom_vjp whose backward recomputes through the plain XLA
conv chain (jax.vjp of the reference) — measured on v5e, XLA's conv backward
already runs at the chip's practical matmul peak, so a bespoke backward
kernel buys nothing; the fused forward is the win (inference / feature
extraction / probes, and the forward half of training).

Parity: fp32 interpret mode vs the flax ConvEncoder to 1e-5 and compiled
bf16 on TPU (tests/test_pallas_conv.py).

Measured reality check (v5e, batch 64, bf16, tz=64): this kernel runs the
forward in 7.4 ms vs XLA's 3.9 ms — XLA's conv lowering already sits at the
chip's practical matmul peak (~115 TF/s measured), and Mosaic's generic
matmul path does not reach it (78 TF/s on a clean 8192^3-class matmul), so
the fused pyramid's saved HBM round-trips cannot make up the MXU-rate gap.
The kernel is therefore OFF by default (EncoderConfig.use_pallas=False) and
kept as a parity-tested alternative path; the XLA chain is the production
encoder on this hardware.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _same_pad_left(t_in: int, k: int, s: int) -> Tuple[int, int]:
    t_out = -(-t_in // s)  # ceil
    total = max((t_out - 1) * s + k - t_in, 0)
    return total // 2, t_out


def plan(kernels: Sequence[int], strides: Sequence[int], t_in: int,
         tz: int) -> dict:
    """Static tile plan. layers[i] = (k, s, A, B, count, t_out_global) for
    layer i's OUTPUT tile; x range is A_x*u + B_x, count x_count."""
    L = len(kernels)
    t = t_in
    t_globals, pads = [], []
    for k, s in zip(kernels, strides):
        padl, t_out = _same_pad_left(t, k, s)
        pads.append(padl)
        t_globals.append(t_out)
        t = t_out
    if t_globals[-1] % tz:
        raise ValueError(f"final length {t_globals[-1]} not divisible by "
                         f"tile {tz}")
    A, B, c = 1, 0, tz
    layers = []
    for i in range(L - 1, -1, -1):
        k, s = kernels[i], strides[i]
        if k % s:
            raise ValueError(f"fused conv needs stride | kernel, got "
                             f"k={k}, s={s}")
        layers.append((k, s, A, B, c, t_globals[i]))
        A, B, c = A * s, B * s - pads[i], (c - 1) * s + k
    layers.reverse()
    return {"layers": layers, "x_A": A, "x_B": B, "x_count": c,
            "t_out": t_globals[-1]}


def _mask_rows(h, start, count: int, t_global: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (count, 1), 0) + start
    ok = jnp.logical_and(rows >= 0, rows < t_global)
    return h * ok.astype(h.dtype)


def _make_kernel(layers, tz: int, main_rows: int, halo: int):
    L = len(layers)

    def kernel(main_ref, halo_ref, *refs):
        w_refs = refs[:L]
        b_refs = refs[L:2 * L]
        out_ref = refs[2 * L]
        tt = pl.program_id(1)
        u = tt * tz

        # layer 1 from frames: (c1, k1) x (k1, C) on the MXU
        k, s, A, B, c_out, t_glob = layers[0]
        frames = jnp.concatenate([main_ref[0], halo_ref[0, 0, :halo]],
                                 axis=0)  # (c1, k1)
        w1 = w_refs[0][:, 0, :]  # (k1, C)
        h = jax.lax.dot_general(
            frames, w1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b_refs[0][0, :].astype(jnp.float32), 0.0)
        h = _mask_rows(h, A * u + B, c_out, t_glob).astype(main_ref.dtype)

        # layers 2..L: reshape-shift matmuls, fp32 accumulation
        for i in range(1, L):
            k, s, A, B, c_out, t_glob = layers[i]
            c_in, C_in = h.shape
            resh = h.reshape(c_in // s, s, C_in)
            acc = jnp.zeros((c_out, w_refs[i].shape[-1]), jnp.float32)
            for j in range(k):
                win = resh[(j // s):(j // s) + c_out, j % s, :]
                acc += jax.lax.dot_general(
                    win, w_refs[i][j],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            h = jnp.maximum(acc + b_refs[i][0, :].astype(jnp.float32), 0.0)
            h = _mask_rows(h, A * u + B, c_out, t_glob)
            if i < L - 1:
                h = h.astype(main_ref.dtype)
        out_ref[0] = h.astype(out_ref.dtype)

    return kernel


def _build_frames(x, p, tz: int):
    """Waveform (B, S) -> (main (B, A1*T_out, k1), halo (B, TT, halo_pad, k1))
    via reshape + static slices (no gather)."""
    B, S = x.shape
    k1, s1, A1, B1, c1, _ = p["layers"][0]
    t_out, TT = p["t_out"], p["t_out"] // tz
    main_rows = A1 * tz
    halo = c1 - main_rows
    halo_pad = -(-halo // 8) * 8
    R = A1 * t_out + halo_pad
    m = k1 // s1  # stride divides kernel (checked in plan)
    pad_l = -p["x_B"]
    L_x = s1 * (R + m)
    xp = jnp.pad(x, ((0, 0), (pad_l, max(L_x - pad_l - S, 0))))[:, :L_x]
    a = xp.reshape(B, R + m, s1)
    frames = jnp.concatenate([a[:, q:q + R] for q in range(m)], axis=-1)
    main = frames[:, :A1 * t_out]
    halo_slabs = jnp.stack(
        [frames[:, main_rows * (t + 1):main_rows * (t + 1) + halo_pad]
         for t in range(TT)], axis=1)  # (B, TT, halo_pad, k1)
    return main, halo_slabs, main_rows, halo, halo_pad


def _pallas_forward(x, weights, biases, kernels, strides, tz, interpret):
    B, S = x.shape
    p = plan(kernels, strides, S, tz)
    layers = p["layers"]
    t_out = p["t_out"]
    TT = t_out // tz
    C_out = weights[-1].shape[-1]
    k1 = kernels[0]

    main, halo_slabs, main_rows, halo, halo_pad = _build_frames(x, p, tz)

    in_specs = [
        pl.BlockSpec((1, main_rows, k1), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, halo_pad, k1), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    ops = [main, halo_slabs]
    for w in weights:
        kk, ci, co = w.shape
        in_specs.append(pl.BlockSpec((kk, ci, co), lambda b, t: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        ops.append(w)
    for b in biases:
        co = b.shape[-1]
        in_specs.append(pl.BlockSpec((1, co), lambda b_, t: (0, 0),
                                     memory_space=pltpu.VMEM))
        ops.append(b.reshape(1, co))

    kernel = _make_kernel(layers, tz, main_rows, halo)
    flops = 0
    t = S
    for kk, s, w in zip(kernels, strides, weights):
        t = -(-t // s)
        flops += 2 * B * t * kk * w.shape[1] * w.shape[2]
    return pl.pallas_call(
        kernel,
        grid=(B, TT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tz, C_out), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_out, C_out), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
    )(*ops)


def _xla_reference(x, weights, biases, kernels, strides):
    """Plain XLA conv chain with identical semantics (the vjp donor)."""
    h = x[..., None]
    for w, b, k, s in zip(weights, biases, kernels, strides):
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(s,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=h.dtype)
        h = jnp.maximum(h + b, 0)
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_conv_encoder(x, weights, biases, kernels, strides, tz=64,
                       interpret=False):
    """x (B, S) -> z (B, S/prod(strides), C). weights[i] (k_i, C_in, C_out),
    biases[i] (C_out,). SAME padding + ReLU per layer, matching
    cpc_tpu.models.encoder.ConvEncoder."""
    return _pallas_forward(x, list(weights), list(biases), kernels, strides,
                           tz, interpret)


def _fwd_rule(x, weights, biases, kernels, strides, tz, interpret):
    out = _pallas_forward(x, list(weights), list(biases), kernels, strides,
                          tz, interpret)
    return out, (x, tuple(weights), tuple(biases))


def _bwd_rule(kernels, strides, tz, interpret, res, g):
    # XLA's conv backward already runs at the chip's practical matmul peak;
    # recompute-and-vjp through the reference chain.
    x, weights, biases = res
    _, vjp = jax.vjp(
        lambda xx, ww, bb: _xla_reference(xx, ww, bb, kernels, strides),
        x, weights, biases)
    dx, dw, db = vjp(g)
    return dx, dw, db


fused_conv_encoder.defvjp(_fwd_rule, _bwd_rule)
