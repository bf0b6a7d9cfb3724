"""Throughput benchmark: CPC pretraining audio-sec/sec/chip (BASELINE.json:2).

Runs the full jitted training step (int16 dequant + encoder + gar + heads +
InfoNCE + backprop + Adam) of the `tpu_fast` config on whatever chip(s) are
attached, with device-resident batches (the 1-core bench host cannot feed a
v5e; production hosts can — the step itself includes the on-device half of
the pipeline).

Prints ONE JSON line. `vs_baseline` is value / 10_000 — the reference
publishes no numbers (BASELINE.md), so the driver-set north-star target of
10k audio-sec/sec/chip (BASELINE.json:5) is the denominator.
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET = 10_000.0  # audio-sec/sec/chip north star (BASELINE.json:5)


def main() -> None:
    import jax

    from cpc_tpu.config import presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.mesh import batch_sharding, make_mesh
    from cpc_tpu.train.train_step import init_state, make_step_fns

    cfg = presets.tpu_fast()
    n_chips = len(jax.devices())
    mesh = make_mesh((-1,), ("data",))
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model, mesh)
    params, opt_state = init_state(cfg, model, steps.optimizer)

    rng = np.random.default_rng(0)
    n_buf = 4
    sharding = batch_sharding(mesh) if mesh.size > 1 else None
    batches = []
    for _ in range(n_buf):
        b = np.clip(rng.standard_normal(
            (cfg.data.batch_size, cfg.data.snippet_samples)) * 6000,
            -32768, 32767).astype(np.int16)
        batches.append(jax.device_put(b, sharding) if sharding is not None
                       else jax.device_put(b))

    # warmup + compile. NOTE: on the axon TPU platform block_until_ready is
    # NOT a real sync — only a device->host value fetch is. Always time with
    # float(...) readbacks.
    for i in range(3):
        params, opt_state, metrics = steps.train_step(params, opt_state,
                                                      batches[i % n_buf])
    float(metrics["loss"])

    iters = 100
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, metrics = steps.train_step(params, opt_state,
                                                      batches[i % n_buf])
    final_loss = float(metrics["loss"])  # forces the chain to complete
    dt = time.perf_counter() - t0

    audio_sec_per_batch = (cfg.data.batch_size * cfg.data.snippet_samples
                           / cfg.data.sample_rate)
    value = iters * audio_sec_per_batch / dt / n_chips
    print(json.dumps({
        "metric": "cpc_pretrain_throughput",
        "value": round(value, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / TARGET, 4),
        "step_ms": round(1000 * dt / iters, 2),
        "config": cfg.name,
        "batch": cfg.data.batch_size,
        "n_chips": n_chips,
        "loss": round(final_loss, 4),
    }))


if __name__ == "__main__":
    main()
