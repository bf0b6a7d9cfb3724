"""Where do the study steps' non-loss milliseconds go? (r5)

exp_allsteps measured, at the 5.12 s study config: full train step 448.6 ms
vs grad(model+loss) 394.5 ms — a 54 ms gap that is not the loss kernel and
not the encoder/gar. Candidates: the on-device augmentation pipeline
(PRNG + gain/noise/shift over (B, 81920) waveforms), int16 dequant +
normalize, Adam + clip + metrics, device-corpus gather, and cross-jit
dispatch accounting (separately-jitted pieces pipeline differently than
one fused step — CLAUDE.md: standalone layer benchmarks lie).

This script times, all on-chip and each in ONE jit:
  step(augment on)  vs  step(augment off)      -> the augment cost
  step(host batch)  vs  step(device_corpus)    -> the gather/index cost
  grad+adam         vs  grad only              -> the optimizer cost
  augment alone                                -> direct augment timing

Run: python benchmarks/exp_study_overhead.py [--snippet 81920]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_allsteps import study_cfg, timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snippet", type=int, default=81920)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpc_tpu.data.loader import device_prepare
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops import dsp
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.train.train_step import init_state, make_step_fns

    print(json.dumps({"backend": jax.default_backend(),
                      "snippet": args.snippet, "batch": args.batch}),
          flush=True)
    rng = np.random.default_rng(0)
    batch_np = np.clip(rng.standard_normal(
        (args.batch, args.snippet)) * 6000, -32768, 32767).astype(np.int16)
    dbatch = jax.device_put(batch_np)
    key = jax.device_put(jax.random.key(1))

    def step_time(cfg, label, with_key=True):
        model = CPCModel(cfg.model)
        steps = make_step_fns(cfg, model, mesh=None)
        params, opt_state = init_state(cfg, model, steps.optimizer)
        p_, o_, m_ = params, opt_state, None
        stepargs = (dbatch, key) if with_key else (dbatch,)
        for _ in range(3):
            p_, o_, m_ = steps.train_step(p_, o_, *stepargs)
        float(np.asarray(m_["loss"]))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            p_, o_, m_ = steps.train_step(p_, o_, *stepargs)
        float(np.asarray(m_["loss"]))
        t = (time.perf_counter() - t0) / iters * 1000
        print(json.dumps({"what": label, "ms": round(t, 2)}), flush=True)
        return t

    cfg_aug = study_cfg(args.snippet, args.batch)
    cfg_noaug = dataclasses.replace(
        cfg_aug, data=dataclasses.replace(cfg_aug.data, augment=False))

    t_aug = step_time(cfg_aug, "step_augment_on")
    t_noaug = step_time(cfg_noaug, "step_augment_off", with_key=False)
    print(json.dumps({"what": "augment_cost_in_step_ms",
                      "ms": round(t_aug - t_noaug, 2)}), flush=True)

    # augment alone (same jit shape as inside the step)
    def aug_only(b, k):
        x = device_prepare(b, normalize=cfg_aug.data.normalize)
        return jnp.sum(dsp.augment_waveform(
            x, k, gain_db=cfg_aug.data.augment_gain_db,
            noise_snr_db=cfg_aug.data.augment_noise_snr_db,
            shift_max=cfg_aug.data.augment_shift_max))
    t_a = timeit(jax.jit(aug_only), (dbatch, key), ms_guess=20)
    print(json.dumps({"what": "augment_alone_ms", "ms": round(t_a, 2)}),
          flush=True)

    # grad-only vs grad+adam, one jit each, loss incl.
    model = CPCModel(cfg_noaug.model)
    steps = make_step_fns(cfg_noaug, model, mesh=None)
    params, _ = init_state(cfg_noaug, model, steps.optimizer)

    def loss_fn(p, b):
        x = device_prepare(b, normalize=cfg_noaug.data.normalize)
        o = model.apply(p, x)
        return infonce_loss_and_metrics(
            o.preds, o.z, negatives="all_steps", use_pallas=True,
            pallas_bf16=cfg_noaug.model.loss.pallas_bf16)[0]

    def grad_scalar(p, b):
        g = jax.grad(loss_fn)(p, b)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree.leaves(g))
    t_g = timeit(jax.jit(grad_scalar), (params, dbatch), ms_guess=400)
    print(json.dumps({"what": "grad_only_ms", "ms": round(t_g, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
