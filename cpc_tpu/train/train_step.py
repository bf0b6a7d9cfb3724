"""The jitted training/eval step (SURVEY.md §2 N4, §4.1).

Everything between the device boundary and the optimizer update is ONE
compiled function: int16 dequant + normalization (cpc_tpu.ops.dsp), encoder,
gar, prediction heads, InfoNCE, backprop, Adam. The reference spreads this
over DataLoader workers + eager torch calls (SURVEY.md §4.1); fusing it is
where most of the TPU throughput comes from.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cpc_tpu.config import CPCConfig
from cpc_tpu.data.loader import device_prepare
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.ops.infonce import infonce_loss_and_metrics
from cpc_tpu.ops.infonce_fused import fused_heads_infonce
from cpc_tpu.parallel.dp import dp_eval_step, dp_train_step


class StepFns(NamedTuple):
    train_step: Callable  # (params, opt_state, batch) -> (params, opt_state, metrics)
    eval_step: Callable   # (params, batch) -> metrics
    optimizer: optax.GradientTransformation
    loss_fn: Callable


def needs_rng(cfg: CPCConfig) -> bool:
    """True when the train step consumes per-step randomness (on-device
    augmentation or transformer dropout) — the single definition used by
    make_step_fns, make_multi_step, and the Trainer."""
    return cfg.data.augment or (cfg.model.ar.kind == "transformer"
                                and cfg.model.ar.dropout > 0.0)


def make_optimizer(cfg: CPCConfig) -> optax.GradientTransformation:
    t = cfg.train
    if t.lr_schedule == "cosine":
        # warmup (possibly 0 steps) then cosine decay to 0 at num_steps
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if t.warmup_steps > 0 else t.learning_rate,
            peak_value=t.learning_rate,
            warmup_steps=t.warmup_steps,
            decay_steps=max(t.num_steps, t.warmup_steps + 1))
    elif t.lr_schedule == "constant":
        if t.warmup_steps > 0:
            lr = optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps)
        else:
            lr = t.learning_rate
    else:
        raise ValueError(
            f"unknown lr_schedule {t.lr_schedule!r} "
            "(expected 'constant' | 'cosine')")
    if t.weight_decay > 0:
        base = optax.adamw(lr, b1=t.beta1, b2=t.beta2,
                           weight_decay=t.weight_decay)
    else:
        base = optax.adam(lr, b1=t.beta1, b2=t.beta2)
    if t.grad_clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), base)
    return base


def resolve_fuse_heads(cfg: CPCConfig, mesh=None) -> bool:
    """Trace-time loss-path chooser (SURVEY.md §8.4; VERDICT r2 next #4).

    The fused heads+InfoNCE kernel's VMEM envelope is a CANDIDATE-POOL
    limit: its score tile is (K*B_local, C) where C is the pool the gather
    reassembles — the configured global batch under cross-replica DP, the
    per-replica batch otherwise. Above the measured envelope
    (infonce_fused.MEASURED_C_ENVELOPE) the fused kernel either fails the
    scoped-vmem compile or never finishes compiling, so large-batch configs
    auto-route to the K-tiled kernel (ops/infonce_pallas, whose score tile
    is (B_local, C) — measured to compile and run through C=1024) instead
    of crashing with a flag hint."""
    loss_cfg = cfg.model.loss
    if not (loss_cfg.use_pallas and loss_cfg.fuse_heads
            and loss_cfg.negatives == "same_step"):
        return False
    n_dev = 1 if mesh is None else mesh.size
    # with gradient accumulation each loss_fn call sees a MICROBATCH, so
    # the candidate pool the kernel actually builds is batch / accum_steps
    accum = max(cfg.train.accum_steps, 1)
    local_b = cfg.data.batch_size // (max(n_dev, 1) * accum)
    C = cfg.data.batch_size // accum \
        if (n_dev == 1 or loss_cfg.cross_replica) else local_b
    from cpc_tpu.ops.infonce_fused import MEASURED_C_ENVELOPE
    if C <= MEASURED_C_ENVELOPE:
        return True
    import warnings
    warnings.warn(
        f"loss.fuse_heads: candidate pool C={C} exceeds the fused kernel's "
        f"measured envelope ({MEASURED_C_ENVELOPE}); auto-selecting the "
        f"K-tiled InfoNCE kernel (same math, ~0.3 ms slower per step at "
        f"batch 64)", stacklevel=2)
    return False


def make_step_fns(cfg: CPCConfig, model: CPCModel, mesh=None) -> StepFns:
    """Builds jitted train/eval steps. With a mesh of >1 devices, steps are
    shard_map-ed DP (batch sharded, grads psum-ed, negatives per
    cfg.model.loss.cross_replica)."""
    opt = make_optimizer(cfg)
    loss_cfg = cfg.model.loss
    normalize = cfg.data.normalize
    augment = cfg.data.augment
    fuse_heads = resolve_fuse_heads(cfg, mesh)
    dropout = (cfg.model.ar.kind == "transformer"
               and cfg.model.ar.dropout > 0.0)

    def loss_fn(params, batch, axis_name=None, rng=None):
        x = device_prepare(batch, normalize=normalize)
        rngs, train = None, False
        if rng is not None:
            if axis_name is not None:
                # per-replica independent randomness
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            k_aug, k_drop = jax.random.split(rng)
            if augment:
                from cpc_tpu.ops.dsp import augment_waveform
                x = augment_waveform(
                    x, k_aug,
                    gain_db=cfg.data.augment_gain_db,
                    noise_snr_db=cfg.data.augment_noise_snr_db,
                    shift_max=cfg.data.augment_shift_max)
            if dropout:
                rngs, train = {"dropout": k_drop}, True
        gather_axis = axis_name if (axis_name and loss_cfg.cross_replica) else None
        if fuse_heads:
            # fused heads+InfoNCE: preds never materialize, and c stays in
            # the GRU's native time-major layout all the way into the
            # kernel (ops/infonce_fused; latents_tm cancels the transpose
            # pair at the model/loss boundary)
            z, c_tm = model.apply(params, x, train=train, rngs=rngs,
                                  method=CPCModel.latents_tm)
            W = params["params"]["prediction_heads"]["kernel"]
            kdtype = jnp.bfloat16 if loss_cfg.pallas_bf16 else jnp.float32
            loss, metrics = fused_heads_infonce(
                c_tm, z, W, num_steps=loss_cfg.prediction_steps,
                axis_name=gather_axis, compute_dtype=kdtype,
                c_time_major=True)
            return loss, metrics
        out = model.apply(params, x, train=train, rngs=rngs)
        loss, metrics = infonce_loss_and_metrics(
            out.preds, out.z,
            negatives=loss_cfg.negatives,
            axis_name=gather_axis,
            use_pallas=loss_cfg.use_pallas,
            pallas_bf16=loss_cfg.pallas_bf16,
            ring=loss_cfg.ring,
        )
        return loss, metrics

    accum = cfg.train.accum_steps
    if accum < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum}")

    def _grads(params, batch, rng, axis_name):
        """(grads, metrics). With accum_steps > 1 the (local) batch splits
        into accum microbatches scanned inside the SAME jit — each one a
        full fwd+bwd whose activations die before the next — and the
        averaged grads feed one optimizer update. Each microbatch is its
        own negative pool (see TrainConfig.accum_steps)."""
        if accum == 1:
            (_, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, axis_name, rng)
            return g, metrics
        B = batch.shape[0]
        if B % accum:
            raise ValueError(
                f"(local) batch {B} is not divisible by accum_steps {accum}")
        mbs = batch.reshape(accum, B // accum, *batch.shape[1:])
        keys = None if rng is None else jax.random.split(rng, accum)

        def body(gsum, inp):
            mb, r = inp if keys is not None else (inp, None)
            (_, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, axis_name, r)
            return jax.tree.map(jnp.add, gsum, g), metrics

        zeros = jax.tree.map(jnp.zeros_like, params)
        gsum, stacked = jax.lax.scan(
            body, zeros, mbs if keys is None else (mbs, keys))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        metrics = jax.tree.map(lambda m: m.mean(axis=0), stacked)
        return grads, metrics

    def train_step(params, opt_state, batch, rng=None, axis_name=None):
        grads, metrics = _grads(params, batch, rng, axis_name)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    def eval_step(params, batch, axis_name=None):
        _, metrics = loss_fn(params, batch, axis_name)
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return metrics

    want_rng = needs_rng(cfg)
    if cfg.data.device_corpus:
        # Device-resident corpus: steps take (corpus (N, S) int16 resident
        # in HBM, idx (B,) int32) and gather the batch ON DEVICE. The only
        # per-step host->device transfer is the tiny index vector — the
        # mitigation for transfer stacks that retain every staged payload
        # (measured: the axon tunnel leaks its full payload per transfer;
        # docs/DESIGN.md "host transfer leak").
        if mesh is not None and mesh.size > 1:
            # device_corpus x DP (VERDICT r3 next #6): the corpus is
            # replicated over the mesh (the Trainer uploads it with
            # replicated(mesh) — it is int16 and small at study scale; HBM
            # budget is checked at load), the (B,) index vector arrives
            # sharded over the data axis, and the gather runs inside the
            # jit — GSPMD makes it replica-local (each device gathers its
            # own rows from its own corpus copy), so the batch rows land
            # sharded exactly like idx and feed the SAME shard_map step as
            # the host path. Host-path equality: tests/test_dp.py.
            axis = mesh.axis_names[0]
            inner = dp_train_step(train_step, mesh, axis=axis,
                                  with_rng=want_rng, donate=False)
            ev_inner = dp_eval_step(eval_step, mesh, axis=axis)

            def train_dc(params, opt_state, corpus, idx, *maybe_rng):
                return inner(params, opt_state, corpus[idx], *maybe_rng)

            return StepFns(
                train_step=jax.jit(train_dc, donate_argnums=(0, 1)),
                eval_step=jax.jit(
                    lambda params, corpus, idx: ev_inner(params,
                                                         corpus[idx])),
                optimizer=opt, loss_fn=loss_fn)

        def train_idx(params, opt_state, corpus, idx, rng=None):
            return train_step(params, opt_state, corpus[idx], rng=rng,
                              axis_name=None)

        def eval_idx(params, corpus, idx):
            return eval_step(params, corpus[idx], axis_name=None)

        if want_rng:
            train = jax.jit(train_idx, donate_argnums=(0, 1))
        else:
            train = jax.jit(functools.partial(train_idx, rng=None),
                            donate_argnums=(0, 1))
        return StepFns(train_step=train, eval_step=jax.jit(eval_idx),
                       optimizer=opt, loss_fn=loss_fn)
    if mesh is not None and mesh.size > 1:
        train = dp_train_step(train_step, mesh, axis=mesh.axis_names[0],
                              with_rng=want_rng)
        evals = dp_eval_step(eval_step, mesh, axis=mesh.axis_names[0])
    else:
        if want_rng:
            train = jax.jit(functools.partial(train_step, axis_name=None),
                            donate_argnums=(0, 1))
        else:
            train = jax.jit(
                functools.partial(train_step, rng=None, axis_name=None),
                donate_argnums=(0, 1))
        evals = jax.jit(functools.partial(eval_step, axis_name=None))
    return StepFns(train_step=train, eval_step=evals, optimizer=opt,
                   loss_fn=loss_fn)


def make_multi_step(cfg: CPCConfig, model: CPCModel, n_steps: int,
                    mesh=None):
    """N train steps chained inside ONE jit via lax.scan over pre-staged
    batches (B_stack = (n_steps, B, S)). Amortizes per-dispatch overhead —
    ~0.75 ms/step on tunneled hosts — at the cost of logging granularity;
    used by bench.py and suitable for production once batches are staged
    device-side. Metrics returned are the last step's.

    With cfg.data.augment (or transformer dropout), pass an `rng` key: it is
    split into one key per step and threaded through the scan (the inner
    step folds in axis_index for per-replica randomness under DP)."""
    if cfg.data.device_corpus:
        raise ValueError(
            "make_multi_step takes pre-staged BATCHES; data.device_corpus "
            "steps take (corpus, idx) instead — stage batches device-side "
            "yourself (they already avoid per-step transfers) or drop the "
            "flag")
    steps = make_step_fns(cfg, model, mesh)
    want_rng = needs_rng(cfg)

    def multi(params, opt_state, batches, rng=None):
        def body(carry, inp):
            params, opt_state = carry
            if want_rng:
                batch, step_rng = inp
                params, opt_state, metrics = steps.train_step(
                    params, opt_state, batch, step_rng)
            else:
                params, opt_state, metrics = steps.train_step(
                    params, opt_state, inp)
            return (params, opt_state), metrics["loss"]

        if want_rng:
            if rng is None:
                raise ValueError(
                    "this config uses per-step randomness (augment/dropout): "
                    "pass an rng key (split per scanned step)")
            xs = (batches, jax.random.split(rng, batches.shape[0]))
        else:
            xs = batches
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), xs)
        return params, opt_state, losses[-1]

    return jax.jit(multi, donate_argnums=(0, 1)), steps


def init_state(cfg: CPCConfig, model: CPCModel, optimizer,
               rng: Optional[jax.Array] = None,
               sample_shape: Optional[Tuple[int, int]] = None) -> Tuple:
    """(params, opt_state) with the model traced at the configured shapes.

    sample_shape overrides the (batch, samples) init input — parameter
    shapes are input-size-independent, so CP training inits at a tiny
    shape instead of materializing the GLOBAL (B, S) forward on one device
    (exactly the tensor CP exists to never build)."""
    if rng is None:
        rng = jax.random.key(cfg.train.seed)
    shape = sample_shape or (cfg.data.batch_size, cfg.data.snippet_samples)
    x = jnp.zeros(shape, jnp.float32)
    params = model.init(rng, x)
    return params, optimizer.init(params)
