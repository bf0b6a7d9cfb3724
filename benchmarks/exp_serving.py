"""Serving-path latency: the real-time streaming step on the chip.

    python benchmarks/exp_serving.py [--chunk-latents 16] [--streams 1 8 32]

Two numbers per stream count, one JSON line each:

  * device_ms — latency of the jitted streaming step (VALID encoder
    forward over one chunk window + GRU state carry), measured by
    CHAINING the recurrent state across >=200 iterations with ONE final
    host fetch (block_until_ready is a no-op on axon and a host fetch
    costs ~36 ms — docs/DESIGN.md; chaining h makes every step depend on
    the previous one, so the pipeline cannot hide the step itself).
  * push_ms — wall latency of one StreamingExtractor.push() including the
    host->device->host round trip. On THIS bench host that is dominated
    by the tunnel fetch; production hosts sit on PCIe (same caveat as
    bench.py's host_in_loop line).

real_time_factor = n_streams * chunk_seconds / device_ms: how many
independent live audio streams one chip sustains at this chunk size
(device-bound; the per-push overhead amortizes with batching streams).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--chunk-latents", type=int, default=16,
                   help="latents per step (16 = 160 ms of audio at 160x)")
    p.add_argument("--streams", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--iters", type=int, default=300)
    args = p.parse_args()

    from cpc_tpu import CPCModel, presets
    from cpc_tpu.eval.streaming import StreamingExtractor, receptive_field
    from cpc_tpu.utils.profiling import sync

    cfg = presets.baseline()
    model = CPCModel(cfg.model)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.key(0),
                        np.zeros((1, 4000), np.float32))
    rf, down = receptive_field(cfg.model.encoder.kernels,
                               cfg.model.encoder.strides)
    n = args.chunk_latents
    W = rf + (n - 1) * down
    chunk_sec = n * down / cfg.data.sample_rate

    for S in args.streams:
        ex = StreamingExtractor(model, params, n_streams=S)
        window = jnp.asarray(
            rng.standard_normal((S, W)).astype(np.float32) * 0.3)
        h0 = jnp.zeros((cfg.model.ar.num_layers, S, cfg.model.ar.d_ar),
                       jnp.float32)

        def step(h, win):
            z = ex._fwd(ex._params, win)
            return ex._gru_ctx(ex._params, z, h)

        # warm both jits, then chain h across iters: one final fetch
        c, h = step(h0, window)
        sync(h)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c, h = step(h, window)
        sync(h)
        device_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # end-to-end push (host round trip included)
        ex.reset()
        chunk = rng.standard_normal((S, n * down)).astype(np.float32)
        ex.push(rng.standard_normal((S, rf)).astype(np.float32))  # prime
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            ex.push(chunk)
        push_ms = (time.perf_counter() - t0) / reps * 1e3

        print(json.dumps({
            "streams": S,
            "chunk_latents": n,
            "chunk_ms": round(chunk_sec * 1e3, 1),
            "device_ms": round(device_ms, 3),
            "push_ms": round(push_ms, 3),
            "real_time_factor": round(S * chunk_sec * 1e3 / device_ms, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
