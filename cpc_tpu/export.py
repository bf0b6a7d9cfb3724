"""Serving export: freeze (model, checkpoint params) into a portable
StableHLO artifact via jax.export.

The reference has no serving story beyond "load the torch checkpoint in
Python" (SURVEY.md §4.5 — the Immersions consumer imports the training
repo). For production serving we instead bake the trained parameters into
a serialized, versioned StableHLO computation: a serving host needs jax
and the artifact bytes — not cpc_tpu, not flax, not the checkpoint tree —
and the computation is frozen against future library changes. Artifacts
are lowered for BOTH cpu and tpu by default, so the same file serves a
TPU fleet and a CPU canary.

Two artifact shapes, matching the two consumer APIs:

  * `export_extractor` — the offline/windowed extractor: f(x (B, S)) ->
    (z, c). The batch dimension is exported SYMBOLICALLY by default (one
    artifact serves any batch size); training-matched `prepare_waveform`
    (dequant + per-snippet normalization) is folded inside, so callers
    send raw fixed-length waveform windows.
  * `export_streaming_step` — the real-time path: the fixed-shape step of
    cpc_tpu.eval.streaming.StreamingExtractor, f(state..., window) ->
    (z, c, state...'). The host keeps the O(receptive_field)
    residual-sample buffer (pure numpy, no jax) and threads the state;
    every step is one fixed compiled shape. GRU state is the hidden
    tensor h; transformer state is the explicit KV-cache carry (stacked
    per-layer K/V buffers + per-stream positions —
    models/transformer.py decode_carry), scanned one latent at a time
    via decode_step.

Pallas kernels are routed OFF in exported computations: Mosaic lowering
is TPU-only and pins the artifact to one backend generation, while the
XLA path lowers portably everywhere (measured on-chip: the XLA inference
forward is within noise of the Pallas one at serving batch sizes — the
kernels earn their keep in the fused training step, not here).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.eval.streaming import receptive_field
from cpc_tpu.ops.dsp import prepare_waveform

FORMAT_VERSION = 1


def _portable_model(model: CPCModel) -> CPCModel:
    """Same params, portable kernels: Pallas flags (and the flash attention
    impl) pinned off so the exported StableHLO has no Mosaic custom calls —
    that is what makes the artifact loadable on cpu AND tpu."""
    cfg = model.config
    enc = dataclasses.replace(cfg.encoder, use_pallas=False)
    ar = dataclasses.replace(cfg.ar, use_pallas=False, attn_impl="xla")
    return CPCModel(dataclasses.replace(cfg, encoder=enc, ar=ar))


def _cast_params(params, dtype_name: Optional[str]):
    if dtype_name is None:
        return params
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    return jax.tree.map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating)
        else p, params)


def export_extractor(
    model: CPCModel,
    params,
    *,
    snippet_samples: int,
    batch: Optional[int] = None,
    normalize: bool = True,
    params_dtype: Optional[str] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> jax_export.Exported:
    """Exported f(x (B, snippet_samples) f32) -> (z (B, T, d_enc),
    c (B, T, d_ar)) with the checkpoint parameters baked in.

    batch=None (default) exports a symbolic batch dimension: one artifact
    answers any batch size. Pass an int to pin it (slightly tighter XLA
    scheduling for a known serving shape).

    params_dtype='bfloat16' bakes the weights in bf16 — the artifact
    halves in size (the baked parameters dominate it) at ~1e-2 relative
    feature error; compute stays in the model's configured dtype.
    """
    m = _portable_model(model)
    params = _cast_params(params, params_dtype)

    def fn(x):
        x = prepare_waveform(x, normalize=normalize)
        return m.apply(params, x, method=CPCModel.latents)

    if batch is None:
        (bdim,) = jax_export.symbolic_shape("b")
    else:
        if batch < 1:
            raise ValueError(f"batch must be >= 1 or None, got {batch}")
        bdim = int(batch)
    spec = jax.ShapeDtypeStruct((bdim, int(snippet_samples)), jnp.float32)
    return jax_export.export(jax.jit(fn), platforms=tuple(platforms))(spec)


def export_streaming_step(
    model: CPCModel,
    params,
    *,
    chunk_latents: int,
    n_streams: int = 1,
    stats: Optional[Tuple[float, float]] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> jax_export.Exported:
    """Exported streaming step with the gar state as an explicit carry:

      GRU:         f(h (num_layers, n_streams, d_ar), window) ->
                   (z, c, h')
      transformer: f(k, v (num_layers, n_streams, max_len, H, Dh),
                   pos (n_streams,) int32, window) -> (z, c, k', v', pos')

    with z (n_streams, n, d_enc), c (n_streams, n, d_ar),
    n = chunk_latents, and W = receptive_field +
    (chunk_latents - 1) * downsample.

    Contract identical to StreamingExtractor (VALID padding, fp32 compute,
    exact state carry — see cpc_tpu/eval/streaming.py for why those are
    forced): the serving host slices fixed W-sample windows that overlap
    by receptive_field - downsample samples (stride = chunk_latents *
    downsample) and threads the state, starting from zeros. Concatenated
    outputs equal the offline VALID forward elementwise (tested). The
    transformer host must ALSO bound each stream by max_len latents and
    may recycle row b by zeroing pos[b] (per-stream positions — the
    decode_step contract, models/transformer.py).
    """
    cfg = model.config
    if chunk_latents < 1:
        raise ValueError(f"chunk_latents must be >= 1, got {chunk_latents}")
    if n_streams < 1:
        raise ValueError(f"n_streams must be >= 1, got {n_streams}")
    if cfg.ar.kind not in ("gru", "transformer"):
        raise ValueError(
            f"the streaming-step artifact supports the gru and transformer "
            f"gar kinds, got {cfg.ar.kind!r}")
    # the exact clone the live StreamingExtractor runs (shared definition
    # — validates conv1d encoder + streamable norm)
    from cpc_tpu.eval.streaming import portable_stream_model
    m = portable_stream_model(cfg)
    rf, down = receptive_field(cfg.encoder.kernels, cfg.encoder.strides)
    window = rf + (chunk_latents - 1) * down
    if stats is not None:
        import math
        m0, s0 = float(stats[0]), float(stats[1])
        if not (math.isfinite(m0) and math.isfinite(s0) and s0 > 0):
            raise ValueError(
                f"stats=(mean, std) needs a finite positive std, got "
                f"({m0}, {s0}) — the artifact would bake (win - mean)/std "
                "as NaN/inf forever")
        stats = (m0, s0)
    fixed = stats

    def norm(win):
        return win if fixed is None else (win - fixed[0]) / fixed[1]

    if cfg.ar.kind == "transformer":
        from cpc_tpu.models.transformer import (CausalTransformer,
                                                carry_decode_model)
        ar = m.config.ar
        tr = carry_decode_model(ar)
        gar_params = params["params"]["gar"]

        def fn(k, v, pos, win):
            z = m.apply(params, norm(win), method=CPCModel.encode)

            def step(carry, z_t):
                c_t, carry = tr.apply({"params": gar_params}, z_t, carry,
                                      method=CausalTransformer.decode_step)
                return carry, c_t

            # wire format stays the stacked (L, B, S, H, Dh) pair (fixed
            # artifact arity regardless of depth); unstack to decode_step's
            # per-layer tuple form around the scan so each token pays only
            # a row scatter, not a stacked-axis slice/update round trip
            L = ar.num_layers
            carry = {"k": tuple(k[i] for i in range(L)),
                     "v": tuple(v[i] for i in range(L)), "pos": pos}
            carry, c_tm = jax.lax.scan(step, carry, z.transpose(1, 0, 2))
            return (z, jnp.transpose(c_tm, (1, 0, 2)),
                    jnp.stack(carry["k"]), jnp.stack(carry["v"]),
                    carry["pos"])

        dh = ar.d_ar // ar.num_heads
        kv = jax.ShapeDtypeStruct(
            (ar.num_layers, n_streams, ar.max_len, ar.num_heads, dh),
            jnp.float32)
        specs = (kv, kv, jax.ShapeDtypeStruct((n_streams,), jnp.int32),
                 jax.ShapeDtypeStruct((n_streams, window), jnp.float32))
        return jax_export.export(jax.jit(fn),
                                 platforms=tuple(platforms))(*specs)

    def fn(h, win):
        z = m.apply(params, norm(win), method=CPCModel.encode)
        c, h2 = m.apply(params, z, h, method=CPCModel.context_with_state)
        return z, c, h2

    specs = (
        jax.ShapeDtypeStruct((cfg.ar.num_layers, n_streams, cfg.ar.d_ar),
                             jnp.float32),
        jax.ShapeDtypeStruct((n_streams, window), jnp.float32),
    )
    return jax_export.export(jax.jit(fn), platforms=tuple(platforms))(*specs)


def save_artifact(path: str, exported: jax_export.Exported,
                  meta: Optional[dict] = None) -> dict:
    """Write the serialized artifact to `path` and a human-readable
    sidecar to `path`.json (shapes, platforms, plus caller metadata such
    as the training config and checkpoint step). Returns the sidecar."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    sidecar = {
        "format_version": FORMAT_VERSION,
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "bytes": len(blob),
        **(meta or {}),
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    return sidecar


def load_artifact(path: str) -> jax_export.Exported:
    """Deserialize an artifact; run it with `.call(*args)`."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
