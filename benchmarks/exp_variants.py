"""Variant throughput: the transformer-gar and scalogram-encoder model
families in the same perf configuration as the headline bench (bf16, batch
64, fused heads+InfoNCE loss where applicable) — so RESULTS.md can state
what switching model family costs.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_cfg(cfg, label, iters=300):
    import jax

    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.mesh import make_mesh
    from cpc_tpu.train.train_step import init_state, make_step_fns

    model = CPCModel(cfg.model)
    mesh = make_mesh((-1,), ("data",))
    steps = make_step_fns(cfg, model, mesh)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    rng = np.random.default_rng(0)
    batch = jax.device_put(np.clip(rng.standard_normal(
        (cfg.data.batch_size, cfg.data.snippet_samples)) * 6000,
        -32768, 32767).astype(np.int16))
    for _ in range(3):
        params, opt_state, m = steps.train_step(params, opt_state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, m = steps.train_step(params, opt_state, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    audio = cfg.data.batch_size * cfg.data.snippet_samples / cfg.data.sample_rate
    print(f"{label:28s}: {dt*1000:7.2f} ms  "
          f"{audio/dt:9.1f} audio-sec/sec/chip", flush=True)


def main():
    from cpc_tpu.config import ArConfig, EncoderConfig, presets

    fast = presets.tpu_fast()
    bench_cfg(fast, "gru + conv1d (headline)")

    tr = dataclasses.replace(
        fast, name="transformer_fast",
        model=dataclasses.replace(
            fast.model,
            ar=ArConfig(kind="transformer", d_ar=256, num_layers=2,
                        num_heads=8)))
    bench_cfg(tr, "transformer gar, bf16 fused")

    sc = dataclasses.replace(
        fast, name="scalogram_fast",
        model=dataclasses.replace(
            fast.model,
            encoder=EncoderConfig(kind="scalogram", scalogram_scale="log"),
            ar=dataclasses.replace(fast.model.ar, use_pallas=False)))
    bench_cfg(sc, "scalogram 2-D encoder, bf16")


if __name__ == "__main__":
    main()
