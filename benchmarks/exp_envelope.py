"""K-tiled InfoNCE kernel envelope at large candidate pools (VERDICT r2
next #4): measure compile + step viability of the auto-selected fallback
path (ops/infonce_pallas) at C in {256, 512, 1024} — the pools a v5e-8
cross-replica dp_global_negatives run reassembles at per-replica batches
32/64/128.

Measures the SINGLE-CHIP equivalent: batch C with cross_replica off — the
kernel sees exactly the (C, Tp, K, D) preds vs (C, T, D) pool it would see
per replica after the gather, which is what decides the Mosaic compile and
the VMEM fit. Full train step (encoder+GRU included) so the number is the
deployable step time.

Run on the chip: python benchmarks/exp_envelope.py [--pools 256,512]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pools", default="256,512,1024")
    p.add_argument("--iters", type=int, default=100)
    args = p.parse_args()

    import jax

    from cpc_tpu.config import presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.train_step import init_state, make_step_fns

    for C in (int(s) for s in args.pools.split(",")):
        cfg = presets.tpu_fast()
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=C))
        # the chooser auto-routes to the K-tiled kernel above the fused
        # envelope; this measures that exact production path
        model = CPCModel(cfg.model)
        steps = make_step_fns(cfg, model, None)
        params, opt_state = init_state(cfg, model, steps.optimizer)
        rng = np.random.default_rng(0)
        batch = jax.device_put(np.clip(rng.standard_normal(
            (C, cfg.data.snippet_samples)) * 6000,
            -32768, 32767).astype(np.int16))
        t0 = time.perf_counter()
        try:
            params, opt_state, m = steps.train_step(params, opt_state, batch)
            loss0 = float(m["loss"])
        except Exception as e:  # compile failure IS the measurement
            print(f"C={C:5d}: COMPILE/RUN FAILED after "
                  f"{time.perf_counter()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, m = steps.train_step(params, opt_state, batch)
        final = float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        audio = C * cfg.data.snippet_samples / cfg.data.sample_rate
        print(f"C={C:5d}: compile {compile_s:6.1f}s  step {dt*1000:8.2f} ms  "
              f"{audio/dt:9.1f} audio-sec/s/chip  loss {loss0:.3f}->{final:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
