"""Kernel microbenchmarks: Pallas hot-path ops vs their XLA references
(SURVEY.md §6.1). Run on the real chip:

    python benchmarks/microbench.py [--batch 64]

Prints one JSON line per op with ms and speedup. Timing uses host-fetch
sync (axon's block_until_ready is a no-op — see cpc_tpu.utils.profiling).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, *a, n=30):
    from cpc_tpu.utils.profiling import sync
    r = fn(*a)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def first(x):
    return jax.tree.leaves(x)[0]


def bench_infonce(B, T=128, K=12, D=512):
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.ops.infonce_pallas import fused_infonce
    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.standard_normal((B, T, K, D)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    Tp = T - K
    g_ref = jax.jit(jax.grad(
        lambda p, zz: infonce_loss_and_metrics(p, zz)[0], argnums=(0, 1)))
    g_pal = jax.jit(jax.grad(
        lambda p, zz: fused_infonce(p[:, :Tp], zz)[0], argnums=(0, 1)))
    ref = timeit(lambda: first(g_ref(preds, z)))
    pal = timeit(lambda: first(g_pal(preds, z)))
    return {"op": "infonce_fwd_bwd", "B": B, "xla_ms": round(ref, 3),
            "pallas_ms": round(pal, 3), "speedup": round(ref / pal, 2)}


def bench_gru(B, T=128, D=512, H=256):
    from cpc_tpu.models.gru import GRU
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    ref_m = GRU(hidden_size=H, dtype=jnp.bfloat16)
    pal_m = GRU(hidden_size=H, dtype=jnp.bfloat16, use_pallas=True)
    params = ref_m.init(jax.random.key(0), x)
    g_ref = jax.jit(jax.grad(
        lambda p, a: jnp.sum(ref_m.apply(p, a).astype(jnp.float32) ** 2)))
    g_pal = jax.jit(jax.grad(
        lambda p, a: jnp.sum(pal_m.apply(p, a).astype(jnp.float32) ** 2)))
    ref = timeit(lambda: first(g_ref(params, x)))
    pal = timeit(lambda: first(g_pal(params, x)))
    return {"op": "gru_fwd_bwd", "B": B, "xla_ms": round(ref, 3),
            "pallas_ms": round(pal, 3), "speedup": round(ref / pal, 2)}


def bench_conv(B, tz=64):
    from cpc_tpu.config import EncoderConfig
    from cpc_tpu.models.encoder import ConvEncoder
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 20480)) * 0.1, jnp.bfloat16)
    ref_m = ConvEncoder(EncoderConfig(), dtype=jnp.bfloat16)
    pal_m = ConvEncoder(EncoderConfig(use_pallas=True, pallas_time_tile=tz),
                        dtype=jnp.bfloat16)
    params = ref_m.init(jax.random.key(0), x)
    f_ref = jax.jit(lambda p, a: ref_m.apply(p, a))
    f_pal = jax.jit(lambda p, a: pal_m.apply(p, a))
    ref = timeit(lambda: f_ref(params, x))
    pal = timeit(lambda: f_pal(params, x))
    return {"op": "conv_encoder_fwd", "B": B, "xla_ms": round(ref, 3),
            "pallas_ms": round(pal, 3), "speedup": round(ref / pal, 2)}


def bench_attention(B, T=1024, H=8, d_model=256):
    """Transformer-gar attention at context-study length: XLA fused-softmax
    (materializes B*H*T^2 scores) vs the Pallas flash kernel."""
    from cpc_tpu.config import ArConfig
    from cpc_tpu.models.transformer import CausalTransformer
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, T, 512)) * 0.1, jnp.bfloat16)
    common = dict(kind="transformer", d_ar=d_model, num_layers=2,
                  num_heads=H, max_len=T)
    ref_m = CausalTransformer(ArConfig(**common), dtype=jnp.bfloat16)
    pal_m = CausalTransformer(ArConfig(attn_impl="flash", **common),
                              dtype=jnp.bfloat16)
    params = ref_m.init(jax.random.key(0), z)
    g_ref = jax.jit(jax.grad(
        lambda p, a: jnp.sum(ref_m.apply(p, a).astype(jnp.float32) ** 2)))
    g_pal = jax.jit(jax.grad(
        lambda p, a: jnp.sum(pal_m.apply(p, a).astype(jnp.float32) ** 2)))
    ref = timeit(lambda: first(g_ref(params, z)), n=10)
    pal = timeit(lambda: first(g_pal(params, z)), n=10)
    return {"op": "attention_fwd_bwd", "B": B, "T": T,
            "xla_ms": round(ref, 3), "pallas_ms": round(pal, 3),
            "speedup": round(ref / pal, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1024,
                    help="attention sequence length (attention op only)")
    ap.add_argument("--ops", default="infonce,gru",
                    help="comma list of infonce,gru,conv,attention (conv "
                         "compile is slow: ~2 min)")
    args = ap.parse_args()
    for op in args.ops.split(","):
        if op.strip() == "attention":
            print(json.dumps(bench_attention(args.batch, T=args.seq)),
                  flush=True)
            continue
        fn = {"infonce": bench_infonce, "gru": bench_gru,
              "conv": bench_conv}[op.strip()]
        print(json.dumps(fn(args.batch)), flush=True)


if __name__ == "__main__":
    main()
