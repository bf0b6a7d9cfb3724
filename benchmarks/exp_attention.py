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


def parity(T: int, dtype, tol: float, impl: str = "flash",
           highest: bool = False) -> None:
    from cpc_tpu.config import ArConfig
    from cpc_tpu.models.transformer import CausalTransformer
    common = dict(kind="transformer", d_ar=256, num_layers=2, num_heads=8,
                  max_len=T)
    m_x = CausalTransformer(ArConfig(**common), dtype=dtype)
    m_f = CausalTransformer(ArConfig(attn_impl=impl, **common),
                            dtype=dtype)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, T, 512)),
                    jnp.float32)
    import contextlib
    prec = (jax.default_matmul_precision("highest") if highest
            else contextlib.nullcontext())
    with prec:
        params = m_x.init(jax.random.PRNGKey(0), z)
        a = np.asarray(jax.jit(m_x.apply)(params, z), np.float32)
        b = np.asarray(jax.jit(m_f.apply)(params, z), np.float32)
    err = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
    ok = bool(err < tol)
    name = f"{impl}_parity_compiled" + ("_highest" if highest else "")
    print(json.dumps({"check": name, "T": T,
                      "dtype": str(dtype.__name__), "rel_err": round(err, 6),
                      "ok": ok}), flush=True)
    if not ok:
        raise SystemExit(f"{impl} parity FAILED at T={T} {dtype}"
                         f"{' (highest)' if highest else ''}: {err}")


def sweep_point(B: int, T: int, H: int = 8, d_model: int = 256) -> dict:
    """fwd+bwd ms for each impl at (B, T), each impl failing independently
    (XLA's materialized scores are EXPECTED to stop compiling/fitting at
    some T while flash keeps going — that point is the capability claim)."""
    from benchmarks.microbench import first, timeit
    from cpc_tpu.config import ArConfig
    from cpc_tpu.models.transformer import CausalTransformer
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, T, 512)) * 0.1, jnp.bfloat16)
    out = {"op": "attention_fwd_bwd", "B": B, "T": T}
    common = dict(kind="transformer", d_ar=d_model, num_layers=2,
                  num_heads=H, max_len=T)
    params = None
    for label, impl in (("xla_ms", "xla"), ("pallas_ms", "flash"),
                        ("pallas16_ms", "flash16")):
        m = CausalTransformer(ArConfig(attn_impl=impl, **common),
                              dtype=jnp.bfloat16)
        try:
            if params is None:
                params = m.init(jax.random.key(0), z)
            g = jax.jit(jax.grad(
                lambda p, a, mm=m: jnp.sum(
                    mm.apply(p, a).astype(jnp.float32) ** 2)))
            out[label] = round(timeit(lambda: first(g(params, z)), n=10), 3)
        except Exception as e:
            out[label.replace("_ms", "_error")] = str(e)[:160]
    if "xla_ms" in out and "pallas_ms" in out:
        out["speedup"] = round(out["xla_ms"] / out["pallas_ms"], 2)
    if "xla_ms" in out and "pallas16_ms" in out:
        out["speedup16"] = round(out["xla_ms"] / out["pallas16_ms"], 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--sweep", default="512,1024,2048",
                    help="context lengths for the timing sweep; the XLA "
                         "path is allowed to fail (recorded, not fatal) — "
                         "that failure point IS the capability claim")
    args = ap.parse_args()

    # fp32 tolerance is bf16-sized BY MEASUREMENT: this platform's default
    # fp32 matmul precision is bf16-level (a plain 256^3 fp32 jnp.dot
    # measures 2.3e-3 max rel err vs fp64, and Mosaic's dot agrees with
    # XLA's BITWISE on that matmul; Precision.HIGHEST restores 1.4e-7 but
    # neither the flax MHA path nor the kernel requests it). Two impls
    # with different reduction ORDERS therefore differ by bf16 rounding
    # noise, ~3e-3 on a 2-layer transformer output (measured 2026-08-19,
    # fresh bench VM — the old VM's toolchain gave <1e-4 here). The
    # logic-level parity gate is the interpret-mode suite
    # (tests/test_pallas_attention.py), which is exact to fp32.
    parity(128, jnp.float32, 8e-3)
    # The TIGHT gate survives independently of the platform's default-
    # precision drift (ADVICE r3): under default_matmul_precision('highest')
    # both the flax MHA path and the kernel's precision-unannotated
    # dot_generals run full-fp32 accumulation, so reduction-order noise
    # collapses back to ~1e-7-level and sub-bf16-magnitude kernel
    # regressions are visible again at the original 1e-4 tolerance.
    parity(128, jnp.float32, 1e-4, highest=True)
    parity(args.seq, jnp.bfloat16, 3e-2)
    parity(args.seq, jnp.bfloat16, 5e-2, impl="flash16")

    for T in (int(s) for s in args.sweep.split(",")):
        print(json.dumps(sweep_point(args.batch, T)), flush=True)


if __name__ == "__main__":
    main()
