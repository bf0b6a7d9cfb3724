"""A/B: audio-sec/sec/chip vs batch size with the fused heads+InfoNCE loss.

Round-1 measured B=128/256 flat at ~7.3-7.6k with the UNFUSED loss. The
fused kernel's per-tau dot has C=B candidates on the 128-lane axis, so
B=64 runs the score matmul at half lane occupancy; this re-measures the
batch sweep post-fusion.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from cpc_tpu.config import presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.mesh import make_mesh
    from cpc_tpu.train.train_step import init_state, make_step_fns

    base = presets.tpu_fast()
    mesh = make_mesh((-1,), ("data",))
    for B in (64, 96, 128):
        cfg = dataclasses.replace(
            base, data=dataclasses.replace(base.data, batch_size=B))
        model = CPCModel(cfg.model)
        steps = make_step_fns(cfg, model, mesh)
        params, opt_state = init_state(cfg, model, steps.optimizer)
        rng = np.random.default_rng(0)
        batches = [jax.device_put(np.clip(rng.standard_normal(
            (B, cfg.data.snippet_samples)) * 6000, -32768, 32767)
            .astype(np.int16)) for _ in range(4)]
        for i in range(5):
            params, opt_state, m = steps.train_step(params, opt_state,
                                                    batches[i % 4])
        float(m["loss"])
        iters = 300
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, m = steps.train_step(params, opt_state,
                                                    batches[i % 4])
        float(m["loss"])
        dt = time.perf_counter() - t0
        audio = B * cfg.data.snippet_samples / cfg.data.sample_rate
        print(f"B={B:4d} step={1000*dt/iters:7.2f} ms "
              f"audio-sec/sec/chip={iters*audio/dt:9.1f}", flush=True)


if __name__ == "__main__":
    main()
