"""Large-batch full-step envelope (VERDICT r2 next #4): compile + step
viability of the AUTO-SELECTED production path at batch C in
{256, 512, 1024} on one chip, whatever the trace-time choosers pick
(K-tiled InfoNCE past the fused C=128 envelope; lax.scan GRU past B=384;
jnp scorer past 512 prediction rows). The printed row is therefore the
deployable single-chip step, not a single kernel's number — per-kernel
envelope isolation results live in docs/DESIGN.md "Large-pool envelope"
(measured r3: K-tiled fwd compiles at 1024 rows, its BACKWARD crashes the
Mosaic helper, and the DP-realistic per-replica shapes rows<=128 x pool
<=1024 all run).

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
