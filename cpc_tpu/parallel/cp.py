"""Context parallelism for the transformer gar (SURVEY.md §3 parallelism
checklist; the scaling axis behind RESULTS.md's context-length findings).

DP shards the batch, TP shards the model; CP shards the SEQUENCE. The
context-scaling study showed context length is the representation lever for
temporal speaker structure, and a single chip caps it at whatever (B, T, D)
activation set fits HBM. Every op in `models/transformer.py` except
attention is per-position, so the whole gar runs under shard_map with z
split along T: parameters replicated, activations T-sharded, and attention
— the one position-mixing op — sweeping KV chunks around the mesh's ICI
ring (`ops/attention_ring.py`, the infonce_ring ppermute pattern applied to
the attention matrix). The positional table is indexed at each shard's
global offset inside the module itself (attn_impl='ring').

Scope (documented, deliberate): CP covers the gar, where the quadratic
cost and the long-range mixing live. The conv encoder is a short-FIR local
op — for audio beyond one chip, encode time-chunks data-parallel (the
fields are strictly local) and reshard z (B, T, D) -> T-sharded; gar+loss
then run CP. `cp_transformer_apply` is the building block and the unit the
driver dryrun exercises end-to-end with gradients.

Every entry point also takes `dp_axis` for a 2-D DP x CP mesh (batch
sharded over data, time over ctx): the per-position ops and the attention
ring are batch-independent, and the InfoNCE ring runs over the FLATTENED
(dp, ctx) axes so negatives still span the global B_glob * T_glob pool —
batch scale and context scale compose instead of competing for the mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cpc_tpu.config import ArConfig


@functools.lru_cache(maxsize=32)
def _cp_runner(cfg: ArConfig, mesh: Mesh, axis: str, dp_axis, dtype,
               param_dtype):
    """Jitted shard_map apply, cached per (config, mesh, axes, dtypes) so
    repeated calls reuse the compiled executable instead of retracing the
    whole transformer (remote TPU compiles cost minutes — CLAUDE.md)."""
    from cpc_tpu.models.transformer import CausalTransformer

    model = CausalTransformer(cfg, dtype=dtype, param_dtype=param_dtype)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(dp_axis, axis, None)),
        out_specs=P(dp_axis, axis, None))
    def run(p, z_shard):
        return model.apply(p, z_shard)

    return run


def cp_transformer_apply(cfg: ArConfig, params: Any, z: jnp.ndarray, *,
                         mesh: Mesh, axis: str | None = None,
                         dp_axis: str | None = None,
                         dtype: Any = jnp.float32,
                         param_dtype: Any = jnp.float32) -> jnp.ndarray:
    """c = gar(z) with T sharded over `axis` (default: cfg.cp_axis).

    z: GLOBAL (B, T, D); T must divide by the axis size. params are the
    standard CausalTransformer tree (replicated — any checkpoint loads).
    Output is the global (B, T, d_ar), sharded the same way. dtype/
    param_dtype thread to the module (run bf16 pipelines at bf16 — the
    T-sharded activations are the memory CP exists to split). With
    `dp_axis` (2-D DP x CP mesh) B is additionally sharded over that axis
    — every transformer op is batch-independent, so this is free.
    """
    axis = axis or cfg.cp_axis
    R = _axis_size(mesh, axis)
    T = z.shape[1]
    if T % R:
        raise ValueError(f"T={T} not divisible by mesh axis {axis!r}={R}")
    _check_dp(mesh, dp_axis, axis, z.shape[0])
    impl = _ring_impl(cfg.attn_impl)
    if cfg.attn_impl != impl or cfg.cp_axis != axis:
        cfg = dataclasses.replace(cfg, attn_impl=impl, cp_axis=axis)
    return _cp_runner(cfg, mesh, axis, dp_axis, dtype, param_dtype)(params, z)


def _gar_heads_ctx_loss(model, model_cfg, params, z, axis, dp_axis=None):
    """Shared tail of both CP runners: gar (ring attention) + the fused
    K-head Dense (per-position on the local chunk) + the time-sharded
    all-steps InfoNCE sweeping the global pool on the same ring (over the
    flattened (dp_axis, axis) ring when batch is sharded too)."""
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce_ring import ring_infonce_allsteps_ctx

    c = model.apply(params, z, method=CPCModel.context_from_z)
    B, T_loc, _ = c.shape
    preds = model.apply(params, c, method=CPCModel.predict).reshape(
        B, T_loc, model_cfg.loss.prediction_steps, model_cfg.encoder.d_enc)
    return ring_infonce_allsteps_ctx(preds, z, axis_name=axis,
                                     data_axis=dp_axis)


@functools.lru_cache(maxsize=32)
def _cp_audio_runner(model_cfg, mesh: Mesh, axis: str, dp_axis):
    from cpc_tpu.models.cpc import CPCModel, _dtype
    from cpc_tpu.models.encoder import ConvEncoder

    _validate_cp_model(model_cfg)
    if model_cfg.encoder.kind != "conv1d":
        raise ValueError(
            "CP-from-audio shards the conv1d encoder with halo exchange; "
            f"encoder.kind={model_cfg.encoder.kind!r} (scalogram framing "
            "spans window boundaries — encode it data-parallel and use "
            "cp_cpc_loss_and_metrics on the latents)")
    ar = model_cfg.ar
    impl = _ring_impl(ar.attn_impl)
    if ar.attn_impl != impl or ar.cp_axis != axis:
        model_cfg = dataclasses.replace(
            model_cfg, ar=dataclasses.replace(ar, attn_impl=impl,
                                              cp_axis=axis))
    dt, pdt = _dtype(model_cfg.dtype), _dtype(model_cfg.param_dtype)
    enc = ConvEncoder(model_cfg.encoder, dtype=dt, param_dtype=pdt,
                      cp_axis=axis)
    model = CPCModel(model_cfg)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(dp_axis, axis)),
        out_specs=(P(), P()))
    def run(params, x_shard):
        z = enc.apply({"params": params["params"]["encoder"]}, x_shard)
        return _gar_heads_ctx_loss(model, model_cfg, params, z, axis,
                                   dp_axis)

    return run


def cp_cpc_loss_from_audio(model_cfg, params, x: jnp.ndarray, *,
                           mesh: Mesh, axis: str | None = None,
                           dp_axis: str | None = None):
    """The WHOLE CPC loss from raw audio, context-parallel end-to-end:
    waveform (B, S) sharded along time → conv encoder with per-layer halo
    exchange (models/encoder.py ConvEncoder.cp_axis) → gar (ring attention)
    → heads → time-sharded all-steps InfoNCE. Params replicated; every
    activation T-sharded; == the single-device loss and parameter grads
    (tests/test_ring_attention.py). S must divide by axis_size *
    prod(encoder.strides).

    `dp_axis` turns this into the 2-D DP x CP training loss: batch sharded
    over dp_axis, time over axis, and ONE logical InfoNCE ring sweeping the
    flattened (dp, ctx) device set so negatives span the GLOBAL
    B_glob * T_glob pool — the large-batch long-context configuration
    neither 1-D strategy reaches alone. Note encoder.norm='batch' computes
    its statistics per DATA shard in this mode (the global (B_loc, T_glob)
    set — standard DP BatchNorm semantics); all other norms are per-sample
    and stay exactly equal to single-device."""
    axis = axis or model_cfg.ar.cp_axis
    R = _axis_size(mesh, axis)
    if x.shape[1] % R:
        raise ValueError(f"audio length {x.shape[1]} not divisible by mesh "
                         f"axis {axis!r}={R}")
    _check_dp(mesh, dp_axis, axis, x.shape[0])
    return _cp_audio_runner(model_cfg, mesh, axis, dp_axis)(params, x)


def make_cp_train_step(cfg, *, mesh: Mesh, axis: str | None = None,
                       dp_axis: str | None = None):
    """FULL context-parallel (or 2-D DP x CP) training step from raw audio:
    jit of value_and_grad through cp_cpc_loss_from_audio + the repo's
    standard optimizer (train/train_step.make_optimizer — Adam/AdamW,
    warmup/cosine schedule, global-norm clipping, all from cfg.train).

    Returns (step, optimizer); step(params, opt_state, x) -> (params,
    opt_state, metrics) with metrics carrying the ring-global loss /
    per-k acc / grad_norm. x is the waveform batch (B, S_global), int16
    wire or float — the on-device prep (dequantize + per-snippet
    normalization per cfg.data.normalize) runs inside the jit, OUTSIDE
    the shard_map: its reductions span the sharded time axis, and GSPMD
    inserts the collectives, so normalization matches single-device
    exactly. Shard x with NamedSharding(mesh, P(dp_axis, axis)) to keep
    the batch off any single device; params/opt_state stay replicated
    (CP's memory win is the ACTIVATIONS) and are donated each step.
    With cfg.data.augment the step takes a 4th `rng` arg (the Trainer's
    per-step key) and runs ops/dsp.augment_waveform on the GLOBAL batch
    inside the jit but OUTSIDE the shard_map — the same placement
    device_prepare's cross-shard normalization already uses. Every
    augmentation op is a global-shape op (per-sample gain/polarity,
    counter-based partitionable PRNG noise, circular time shift), so GSPMD
    inserts the collectives (the shift crosses ctx-shard boundaries) and
    the augmented waveform is EXACTLY the single-device one for the same
    key — equality-tested in tests/test_ring_attention.py. With
    cfg.data.device_corpus the step takes (params, opt_state, corpus,
    idx[, rng]) — replicated HBM corpus, data-axis-sharded indices,
    replica-local gather (tests/test_train_integration.py pins trained-
    params equality vs the host path). Knobs this wrapper does NOT
    implement still raise (cfg.train.accum_steps > 1).
    Trainability is tested on the 8-virtual-device mesh
    (tests/test_ring_attention.py) and the driver dryrun jits one full
    step per round."""
    import functools as _ft

    import optax

    from cpc_tpu.data.loader import device_prepare
    from cpc_tpu.train.train_step import make_optimizer

    if cfg.train.accum_steps > 1:
        raise ValueError(
            "make_cp_train_step does not implement gradient accumulation; "
            f"set train.accum_steps=1 (got {cfg.train.accum_steps})")
    mcfg = cfg.model
    axis = axis or mcfg.ar.cp_axis
    normalize = cfg.data.normalize
    dcfg = cfg.data
    opt = make_optimizer(cfg)

    def _prepare(x, rng):
        xf = device_prepare(x, normalize=normalize)
        if rng is not None:
            from cpc_tpu.ops.dsp import augment_waveform
            # same key discipline as the standard loss_fn (train_step.py):
            # split off k_aug so a future dropout key stays compatible
            k_aug, _ = jax.random.split(rng)
            xf = augment_waveform(xf, k_aug,
                                  gain_db=dcfg.augment_gain_db,
                                  noise_snr_db=dcfg.augment_noise_snr_db,
                                  shift_max=dcfg.augment_shift_max)
        return xf

    def _step(params, opt_state, x, rng=None):
        if dcfg.device_corpus:
            # x is (corpus, idx): replicated HBM corpus + data-axis-sharded
            # index vector. The gather is replica-local; GSPMD slices the
            # gathered rows' TIME axis onto the ctx shards (no comm — the
            # corpus copy is whole on every device). Same wire as the DP
            # path (train_step.py), equality-tested on the CPU mesh.
            corpus, idx = x
            x = corpus[idx]
        xf = _prepare(x, rng)
        (_, metrics), grads = jax.value_and_grad(
            lambda p: cp_cpc_loss_from_audio(mcfg, p, xf, mesh=mesh,
                                             axis=axis, dp_axis=dp_axis),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    if dcfg.device_corpus:
        # Trainer wire: (params, opt_state, corpus, idx[, rng]) — the
        # same arg order as the DP device-corpus step
        if dcfg.augment:
            step = jax.jit(lambda p, o, c, i, r: _step(p, o, (c, i), r),
                           donate_argnums=(0, 1))
        else:
            step = jax.jit(lambda p, o, c, i: _step(p, o, (c, i)),
                           donate_argnums=(0, 1))
    elif dcfg.augment:
        # rng is REQUIRED positionally: a legacy 3-arg call must fail
        # loudly, not fall into _step's rng=None default and silently
        # skip augmentation (the knob-does-nothing failure mode this
        # module's build-time raises exist to prevent)
        step = jax.jit(lambda p, o, x, r: _step(p, o, x, r),
                       donate_argnums=(0, 1))
    else:
        step = jax.jit(_ft.partial(_step, rng=None), donate_argnums=(0, 1))
    return step, opt


def make_cp_step_fns(cfg, mesh: Mesh, *, axis: str = "ctx",
                     dp_axis: str | None = None):
    """Trainer-compatible StepFns for CP / 2-D DP x CP training
    (train.parallel='cp'|'dpcp' — the Trainer builds these instead of the
    DP make_step_fns). train_step is make_cp_train_step's full step
    (int16-or-float batch in, on-device prep inside the jit); eval_step is
    the same loss path without gradients. Config knobs this path cannot
    honor raise HERE, at build time, with the reason — never silently."""
    from cpc_tpu.train.train_step import StepFns

    _validate_cp_model(cfg.model)  # transformer gar + all_steps, early
    if cfg.model.ar.dropout > 0:
        raise ValueError(
            "context-parallel training has no dropout path (ring/zigzag "
            "attention does not implement attention dropout, and the CP "
            "loss runner threads no rng); set model.ar.dropout=0.0")
    loss = cfg.model.loss
    # the CP loss is ALWAYS the flattened-ring all_steps sweep — the DP
    # loss-kernel selectors don't apply. Knobs that would otherwise change
    # behavior raise rather than silently stop mattering.
    ignored = [k for k, bad in (
        ("loss.cross_replica", not loss.cross_replica),  # CP is global
        ("loss.use_pallas", loss.use_pallas),
        ("loss.pallas_bf16", loss.pallas_bf16),
        ("loss.fuse_heads", loss.fuse_heads),
        ("loss.ring", loss.ring),  # implied; the DP selector is meaningless
    ) if bad]
    if ignored:
        raise ValueError(
            f"CP training always sweeps the global pool on the (dp, ctx) "
            f"ring; these settings would be silently ignored: {ignored} — "
            f"leave them at their defaults")
    step, opt = make_cp_train_step(cfg, mesh=mesh, axis=axis,
                                   dp_axis=dp_axis)
    mcfg = cfg.model
    normalize = cfg.data.normalize

    def loss_fn(params, batch):
        from cpc_tpu.data.loader import device_prepare
        xf = device_prepare(batch, normalize=normalize)
        return cp_cpc_loss_from_audio(mcfg, params, xf, mesh=mesh,
                                      axis=axis, dp_axis=dp_axis)

    if cfg.data.device_corpus:
        eval_step = jax.jit(
            lambda params, corpus, idx: loss_fn(params, corpus[idx])[1])
    else:
        eval_step = jax.jit(lambda params, batch: loss_fn(params, batch)[1])

    return StepFns(train_step=step, eval_step=eval_step, optimizer=opt,
                   loss_fn=loss_fn)


def _validate_cp_model(model_cfg) -> None:
    if model_cfg.ar.kind != "transformer":
        raise ValueError(
            "context parallelism shards the transformer gar; the GRU's "
            "recurrence is inherently sequential (got ar.kind="
            f"{model_cfg.ar.kind!r})")
    if model_cfg.loss.negatives != "all_steps":
        raise ValueError(
            "the CP loss sweeps the all_steps pool by construction; set "
            f"loss.negatives='all_steps' (got {model_cfg.loss.negatives!r} "
            "— same_step has no time-sharded formulation: its candidates "
            "all live at one target step, i.e. on a single device)")


def _axis_size(mesh: Mesh, axis: str) -> int:
    if axis not in mesh.shape:
        raise ValueError(
            f"mesh has no {axis!r} axis (axes: {tuple(mesh.shape)}); build "
            f"one with make_mesh((-1,), ({axis!r},)) or pass axis=... "
            f"naming an existing mesh axis to shard T over")
    return mesh.shape[axis]


def _ring_impl(attn_impl: str) -> str:
    """CP needs a ring-family attention; keep the user's 'zigzag' choice
    (the balanced schedule, ops/attention_zigzag.py), coerce anything else
    to 'ring'."""
    return attn_impl if attn_impl in ("ring", "zigzag") else "ring"


def _check_dp(mesh: Mesh, dp_axis, axis: str, B: int) -> None:
    """Validate the optional DP axis of a 2-D DP x CP call."""
    if dp_axis is None:
        return
    if dp_axis == axis:
        raise ValueError(
            f"dp_axis and the context axis must be distinct mesh axes "
            f"(both {axis!r})")
    R_d = _axis_size(mesh, dp_axis)
    if B % R_d:
        raise ValueError(f"batch {B} not divisible by mesh axis "
                         f"{dp_axis!r}={R_d}")


@functools.lru_cache(maxsize=32)
def _cp_loss_runner(model_cfg, mesh: Mesh, axis: str, dp_axis):
    from cpc_tpu.models.cpc import CPCModel

    _validate_cp_model(model_cfg)
    ar = model_cfg.ar
    impl = _ring_impl(ar.attn_impl)
    if ar.attn_impl != impl or ar.cp_axis != axis:
        model_cfg = dataclasses.replace(
            model_cfg, ar=dataclasses.replace(ar, attn_impl=impl,
                                              cp_axis=axis))
    model = CPCModel(model_cfg)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(dp_axis, axis, None)),
        out_specs=(P(), P()))
    def run(params, z_shard):
        return _gar_heads_ctx_loss(model, model_cfg, params, z_shard, axis,
                                   dp_axis)

    return run


def cp_cpc_loss_and_metrics(model_cfg, params, z: jnp.ndarray, *,
                            mesh: Mesh, axis: str | None = None,
                            dp_axis: str | None = None):
    """The full CPC loss path, context-parallel: gar (ring attention) →
    prediction heads → all-steps InfoNCE over the GLOBAL B*T pool
    (ops/infonce_ring.ring_infonce_allsteps_ctx), with z (B, T, D) sharded
    along T and params replicated. Returns (loss, metrics) — global scalars,
    differentiable w.r.t. params and z; equal to the single-device
    infonce_loss_and_metrics(negatives='all_steps') on the same arrays
    (tests/test_ring_attention.py). Production note: encode audio
    data-parallel (the conv fields are strictly local in time), reshard
    (B, T, D) → T-sharded once, then this is the training step's loss half.

    `dp_axis` additionally shards B over that mesh axis (2-D DP x CP): one
    flattened (dp, ctx) InfoNCE ring sweeps the global B_glob * T_glob
    pool — see cp_cpc_loss_from_audio."""
    axis = axis or model_cfg.ar.cp_axis
    R = _axis_size(mesh, axis)
    if z.shape[1] % R:
        raise ValueError(f"T={z.shape[1]} not divisible by mesh axis "
                         f"{axis!r}={R}")
    _check_dp(mesh, dp_axis, axis, z.shape[0])
    return _cp_loss_runner(model_cfg, mesh, axis, dp_axis)(params, z)
