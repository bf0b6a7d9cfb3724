"""Remat chip measurement: what do `encoder.remat` / `ar.remat` actually buy
on the device (SURVEY.md §8 HBM-for-FLOPs; config knobs in cpc_tpu/config.py)?

    python benchmarks/exp_remat.py [--batch 8] [--seconds 5.12]

Per (family, remat) point, prints one JSON line with:
  * temp_mib — XLA's buffer-assignment temp allocation for the jitted
    grad step (`compile().memory_analysis()`), the honest liveness number.
    NOTE: only meaningful on the TPU backend — CPU buffer assignment models
    a different machine and even reports remat as LARGER on a textbook
    matmul chain (measured 2026-08-18, docs/DESIGN.md), so this script
    refuses to print memory numbers off-TPU.
  * fwd_bwd_ms — measured grad-step time (the recompute's FLOP cost).

The capability claim to check at the long end: with remat, the max
compilable context should exceed the plain path's on a fixed HBM budget.
`--sweep` measures exactly that: per family (plain vs remat), double the
context from --seconds until the grad step no longer compiles+runs, and
report the last context that did. The transformer points run
attn_impl='flash' so attention memory is O(T) and the conv activations —
the tensors remat frees — are the binding constraint.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def point(name: str, B: int, T: int, overrides) -> dict:
    from benchmarks.microbench import first, timeit
    from cpc_tpu.config import apply_overrides, presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics

    cfg = apply_overrides(presets.by_name(name), list(overrides))
    model = CPCModel(cfg.model)
    rec = {"family": name, "B": B, "T": T,
           "remat": [o for o in overrides if "remat" in o] or ["off"]}
    try:
        # everything device-touching lives inside the try: at the long end
        # of --sweep the first allocation to blow HBM can be the EAGER init
        # forward or the x transfer itself, and that failure is the data
        # point, not a crash
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, T)) * 0.1,
            jnp.float32)
        params = model.init(jax.random.key(0), x)

        def loss(p):
            out = model.apply(p, x)
            return infonce_loss_and_metrics(out.preds, out.z)[0]

        compiled = jax.jit(jax.grad(loss)).lower(params).compile()
        if jax.default_backend() == "tpu":
            ma = compiled.memory_analysis()
            rec["temp_mib"] = round(ma.temp_size_in_bytes / 2**20, 1)
        # one host fetch costs ~36 ms on the axon tunnel (CLAUDE.md) and
        # timeit syncs ONCE per call, adding 36/n ms to the reported step:
        # pick n from a coarse probe so that error stays <~1% — 300 iters
        # for short steps, fewer (where the absolute error is relatively
        # tiny) once a step costs tens of ms
        coarse = timeit(lambda: first(compiled(params)), n=3)
        n = max(30, min(300, int(6000.0 / max(coarse, 1.0))))
        rec["fwd_bwd_ms"] = round(timeit(lambda: first(compiled(params)),
                                         n=n), 2)
        rec["timing_n"] = n
        rec["ok"] = True
    except Exception as e:  # OOM/compile failure IS the data point
        rec.update(ok=False, error=f"{type(e).__name__}: {str(e)[:160]}")
    return rec


def sweep(B: int, T0: int, max_doublings: int) -> None:
    """Double the context until the grad step stops compiling+running; the
    last good T per (family, remat) IS the capability measurement."""
    def tf(T, remat):
        ov = [f"model.ar.max_len={T // 160}", "model.ar.attn_impl=flash"]
        if remat:
            ov += ["model.encoder.remat=true", "model.ar.remat=true"]
        return ov

    def gru(T, remat):
        return ["model.encoder.remat=true"] if remat else []

    for fam, mk in (("baseline", gru), ("transformer_gar", tf)):
        for remat in (False, True):
            best, failed = None, False
            T = T0
            for _ in range(max_doublings + 1):
                rec = point(fam, B, T, mk(T, remat))
                print(json.dumps(rec), flush=True)
                if not rec["ok"]:
                    failed = True
                    break
                best = T
                T *= 2
            # hit_cap: the leg never failed — max_ok_T is CENSORED by
            # --max-doublings, not a measured memory limit
            print(json.dumps({
                "family": fam, "remat": remat, "B": B,
                "max_ok_T": best, "hit_cap": not failed,
                "max_ok_seconds": round(best / 16_000, 2) if best else None,
            }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=5.12,
                    help="context length in audio seconds (16 kHz)")
    ap.add_argument("--sweep", action="store_true",
                    help="double the context until grad-step failure; "
                    "report max ok context per (family, remat)")
    ap.add_argument("--max-doublings", type=int, default=5)
    args = ap.parse_args()
    T = int(round(args.seconds * 16_000 / 160)) * 160  # keep /160 exact
    print(json.dumps({"backend": jax.default_backend(), "B": args.batch,
                      "T": T, "mode": "sweep" if args.sweep else "grid"}),
          flush=True)

    if args.sweep:
        sweep(args.batch, T, args.max_doublings)
        return

    tf_long = [f"model.ar.max_len={T // 160}"]
    grid = [
        ("baseline", []),
        ("baseline", ["model.encoder.remat=true"]),
        ("transformer_gar", tf_long),
        ("transformer_gar", tf_long + ["model.encoder.remat=true"]),
        ("transformer_gar", tf_long + ["model.ar.remat=true"]),
        ("transformer_gar", tf_long + ["model.encoder.remat=true",
                                       "model.ar.remat=true"]),
    ]
    for name, ov in grid:
        print(json.dumps(point(name, args.batch, T, ov)), flush=True)


if __name__ == "__main__":
    main()
