"""Flash-attention chip check: compiled parity vs the XLA attention path,
then fwd+bwd timing at context-study length (RESULTS.md runs 4-5 regime).

    python benchmarks/exp_attention.py [--seq 1024] [--batch 32]

Prints one JSON line per check. Parity here is the COMPILED kernel (Mosaic)
against the XLA path on the same param tree — the interpret-mode parity
lives in tests/test_pallas_attention.py.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def parity(T: int, dtype, tol: float) -> None:
    from cpc_tpu.config import ArConfig
    from cpc_tpu.models.transformer import CausalTransformer
    common = dict(kind="transformer", d_ar=256, num_layers=2, num_heads=8,
                  max_len=T)
    m_x = CausalTransformer(ArConfig(**common), dtype=dtype)
    m_f = CausalTransformer(ArConfig(attn_impl="flash", **common),
                            dtype=dtype)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, T, 512)),
                    jnp.float32)
    params = m_x.init(jax.random.PRNGKey(0), z)
    a = np.asarray(jax.jit(m_x.apply)(params, z), np.float32)
    b = np.asarray(jax.jit(m_f.apply)(params, z), np.float32)
    err = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
    ok = bool(err < tol)
    print(json.dumps({"check": "flash_parity_compiled", "T": T,
                      "dtype": str(dtype.__name__), "rel_err": round(err, 6),
                      "ok": ok}), flush=True)
    if not ok:
        raise SystemExit(f"flash parity FAILED at T={T} {dtype}: {err}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    parity(128, jnp.float32, 1e-4)
    parity(args.seq, jnp.bfloat16, 3e-2)

    from benchmarks.microbench import bench_attention
    print(json.dumps(bench_attention(args.batch, T=args.seq)), flush=True)


if __name__ == "__main__":
    main()
