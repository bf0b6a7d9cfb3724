"""The headline ceiling as a MEASUREMENT (VERDICT r4 next #5b): time a
pure-matmul chain with the conv encoder's exact FLOPs/shapes on this chip,
so "~9.6k audio-sec/sec/chip is the XLA+Mosaic ceiling here" stops being an
extrapolation from the r2 ablation.

The bench encoder (batch 64 bf16, 20480 samples) is, as im2col matmuls:

  L0 (64*4096, 10)   @ (10, 512)     2.7 GF   <- contraction dim 10: the
  L1 (64*1024, 4096) @ (4096, 512) 274.9 GF      1-channel input layer is
  L2 (64*512, 2048)  @ (2048, 512)  68.7 GF      structurally MXU-hostile
  L3 (64*256, 2048)  @ (2048, 512)  34.4 GF
  L4 (64*128, 2048)  @ (2048, 512)  17.2 GF
  total fwd ~398 GF, fwd+bwd ~1.19 TF -> 6.7 ms at the 177 TF/s roofline

This script times that chain (fwd and fwd+bwd, with and without ReLU
between layers) as plain jnp matmuls — the fastest XLA could conceivably
run the encoder's arithmetic if convolution were free of its windowing.
Compare with the measured encoder f+b (7.19 ms, exp_ablate) to bound what
any further conv-kernel work could buy.

Run on the chip: python benchmarks/exp_floor.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 64
# (rows, contraction, out) per layer, from the im2col view of the bench
# encoder (channels 512, kernels 10/8/4/4/4, strides 5/4/2/2/2, 20480
# samples -> T 4096/1024/512/256/128)
SHAPES = [
    (B * 4096, 10, 512),
    (B * 1024, 8 * 512, 512),
    (B * 512, 4 * 512, 512),
    (B * 256, 4 * 512, 512),
    (B * 128, 4 * 512, 512),
]


def timeit(fn, args, iters=300):
    import jax
    out = None
    for _ in range(3):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    Xs = [jax.device_put(jnp.asarray(
        rng.standard_normal((m, k)) * 0.1, dt)) for m, k, _ in SHAPES]
    Ws = [jax.device_put(jnp.asarray(
        rng.standard_normal((k, n)) * 0.05, dt)) for _, k, n in SHAPES]

    flops_fwd = sum(2 * m * k * n for m, k, n in SHAPES)

    # (a) INDEPENDENT layers in one jit — the pure-MXU floor at these
    # shapes: no data dependencies, no im2col traffic
    def indep(xs, ws):
        return sum(jnp.sum((x @ w).astype(jnp.float32) ** 2)
                   for x, w in zip(xs, ws))

    t_f = timeit(jax.jit(indep), (Xs, Ws))
    t_fb = timeit(jax.jit(jax.grad(indep, argnums=(0, 1))), (Xs, Ws))
    print(json.dumps({
        "variant": "independent",
        "fwd_ms": round(t_f, 3),
        "fwd_tflops": round(flops_fwd / t_f / 1e9, 1),
        "fwdbwd_ms": round(t_fb, 3),
        "fwdbwd_tflops": round(3 * flops_fwd / t_fb / 1e9, 1),
    }), flush=True)

    # (b) CHAINED with explicit im2col-style duplication between layers
    # (stride < kernel at L0->L1 and every 4/2 layer means the windowed
    # view reads each element ~2x; jnp.tile pays that copy honestly) +
    # ReLU — the closest a matmul pipeline gets to the encoder's real
    # dataflow
    def chain(x, ws):
        h = x
        for i, w in enumerate(ws):
            h = jax.nn.relu(h @ w)
            if i + 1 < len(ws):
                m, k, _ = SHAPES[i + 1]
                flat = h.reshape(-1)
                reps = -(-(m * k) // flat.shape[0])
                h = jnp.tile(flat, reps)[: m * k].reshape(m, k)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    t_cf = timeit(jax.jit(chain), (Xs[0], Ws))
    t_cfb = timeit(jax.jit(jax.grad(chain, argnums=(0, 1))), (Xs[0], Ws))
    print(json.dumps({
        "variant": "chained+relu+im2col-copies",
        "fwd_ms": round(t_cf, 3),
        "fwd_tflops": round(flops_fwd / t_cf / 1e9, 1),
        "fwdbwd_ms": round(t_cfb, 3),
        "fwdbwd_tflops": round(3 * flops_fwd / t_cfb / 1e9, 1),
    }), flush=True)

    # per-layer isolation: where does the chain lose to the roofline?
    for i, (m, k, n) in enumerate(SHAPES):
        a = jax.device_put(jnp.asarray(
            rng.standard_normal((m, k)) * 0.1, dt))
        w = Ws[i]
        f = jax.jit(lambda a, w: jnp.sum((a @ w).astype(jnp.float32)))
        t = timeit(f, (a, w))
        print(json.dumps({"layer": i, "m": m, "k": k, "n": n,
                          "ms": round(t, 3),
                          "tflops": round(2 * m * k * n / t / 1e9, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
