"""Throughput benchmark: CPC pretraining audio-sec/sec/chip (BASELINE.json:2).

Runs the full jitted training step (int16 dequant + encoder + gar + heads +
InfoNCE + backprop + Adam) on whatever chip(s) are attached, with
device-resident batches (the 1-core bench host cannot feed a v5e;
production hosts can — the step itself includes the on-device half of the
pipeline).

Prints ONE JSON line. The headline `value` is the conv+GRU `tpu_fast`
config; `scalogram_value` and `transformer_value` are the other two model
families at the same perf configuration (bf16, batch 64, fused loss where
applicable) — the scalogram family is the configuration that clears the
10k north star on this chip (VERDICT r2 next #1b). `vs_baseline` is
value / 10_000 — the reference publishes no numbers (BASELINE.md), so the
driver-set target of 10k audio-sec/sec/chip (BASELINE.json:5) is the
denominator.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET = 10_000.0  # audio-sec/sec/chip north star (BASELINE.json:5)


def _bench_config(cfg, iters=400, warmup=5):
    """(audio-sec/sec/chip, step_ms, final_loss, steps, params, opt_state,
    sharding, audio_sec_per_batch, n_chips) for one config's train step."""
    import jax

    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.mesh import batch_sharding, make_mesh
    from cpc_tpu.train.train_step import init_state, make_step_fns

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
    for i in range(warmup):
        params, opt_state, metrics = steps.train_step(params, opt_state,
                                                      batches[i % n_buf])
    float(metrics["loss"])

    # one host fetch costs ~36 ms on the axon tunnel; >=300 pipelined
    # iterations with a single final fetch keep the sync artifact < 0.1
    # ms/step (docs/DESIGN.md "Round-2 measured ground truth")
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, metrics = steps.train_step(params, opt_state,
                                                      batches[i % n_buf])
    final_loss = float(metrics["loss"])  # forces the chain to complete
    dt = time.perf_counter() - t0

    audio_sec_per_batch = (cfg.data.batch_size * cfg.data.snippet_samples
                           / cfg.data.sample_rate)
    value = iters * audio_sec_per_batch / dt / n_chips
    return (value, 1000 * dt / iters, final_loss, steps, params, opt_state,
            sharding, audio_sec_per_batch, n_chips)


def main() -> None:
    from cpc_tpu.config import presets

    cfg = presets.tpu_fast()
    (value, step_ms, final_loss, steps, params, opt_state, sharding,
     audio_sec_per_batch, n_chips) = _bench_config(cfg)
    host_value = _host_in_the_loop(cfg, steps, params, opt_state,
                                   audio_sec_per_batch, n_chips, sharding)

    # the other two model families at the same perf configuration (the
    # presets are shared with tests/test_golden_tpu.py so the bf16 golden
    # pin gates exactly the configs this artifact reports)
    sc_value, sc_ms, _, *_ = _bench_config(presets.scalogram_fast(),
                                           iters=300)
    tr_value, tr_ms, _, *_ = _bench_config(presets.transformer_fast(),
                                           iters=300)

    # the measured-best single-chip config (VERDICT r4 next #5a): B=128
    # fills the fused kernel's candidate lanes and buys ~1% over the B=64
    # production preset, which keeps DP global-pool headroom instead
    # (docs/DESIGN.md "the last millisecond", batch sweep). Reported as its
    # own field so the headline stays the shipped config; guarded so a
    # compile envelope change can never break the bench line itself.
    b128 = {}
    try:
        import dataclasses
        cfg128 = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=128))
        b128_value, b128_ms, _, *_ = _bench_config(cfg128, iters=300)
        b128 = {"batch128_value": round(b128_value, 1),
                "batch128_step_ms": round(b128_ms, 2)}
    except Exception as e:  # pragma: no cover - envelope drift
        b128 = {"batch128_error": str(e)[:120]}

    print(json.dumps({
        "metric": "cpc_pretrain_throughput",
        "value": round(value, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / TARGET, 4),
        "step_ms": round(step_ms, 2),
        "scalogram_value": round(sc_value, 1),
        "scalogram_vs_baseline": round(sc_value / TARGET, 4),
        "scalogram_step_ms": round(sc_ms, 2),
        "transformer_value": round(tr_value, 1),
        "transformer_step_ms": round(tr_ms, 2),
        "host_in_loop_value": round(host_value, 1),
        **b128,
        "config": cfg.name,
        "batch": cfg.data.batch_size,
        "n_chips": n_chips,
        "loss": round(final_loss, 4),
    }))


def _host_in_the_loop(cfg, steps, params, opt_state, audio_sec_per_batch,
                      n_chips, sharding=None, iters=60):
    """Trainer-loop throughput: the Batcher assembles int16 batches from a
    synthetic on-disk corpus (prefetch thread on) and every step crosses the
    host->device boundary — a measured number instead of an argued one
    (VERDICT r1 weak #5).

    Context for reading it on THIS bench host: batch assembly is ~0.5 ms,
    but the host->device link is an axon network tunnel measured at ~45 MB/s
    with no transfer/compute overlap (a 2.6 MB int16 batch costs ~55 ms; a
    2-deep device_put lookahead does not help). On production v5e hosts the
    same path is PCIe at GB/s, so the device-resident number above is the
    architecture's throughput and this line is the tunnel's."""
    import tempfile

    from cpc_tpu.data.dataset import SnippetDataset
    from cpc_tpu.data.loader import Batcher, to_device
    from cpc_tpu.data.synthetic import generate_synthetic_corpus

    with tempfile.TemporaryDirectory() as root:
        generate_synthetic_corpus(root, num_speakers=10, files_per_speaker=2,
                                  seconds_per_file=30.0, seed=7)
        ds = SnippetDataset(root, cfg.data.snippet_samples,
                            sample_rate=cfg.data.sample_rate)
        batcher = Batcher(ds, cfg.data.batch_size, shuffle=True, seed=0,
                          prefetch=cfg.data.prefetch,
                          transfer_dtype=cfg.data.transfer_dtype)
        it = iter(batcher)
        for _ in range(3):  # warm the prefetch thread + reuse compiled step
            _, _, hb = next(it)
            params, opt_state, metrics = steps.train_step(
                params, opt_state, to_device(hb, sharding))
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            _, _, hb = next(it)
            params, opt_state, metrics = steps.train_step(
                params, opt_state, to_device(hb, sharding))
        float(metrics["loss"])
        dt = time.perf_counter() - t0
    return iters * audio_sec_per_batch / dt / n_chips


def _wait_for_relay(deadline_s: float = 900.0) -> bool:
    """Bounded wait for the axon tunnel's local endpoint. The relay can die
    mid-session (observed: >1 h outage); a client that proceeds anyway
    blocks FOREVER inside device discovery — its internal dial loop never
    surfaces the refused connection as an exception. Probing the TCP port
    first turns an eternal silent hang into a bounded, honest failure."""
    import socket
    t0 = time.time()
    while True:
        try:
            socket.create_connection(("127.0.0.1", 8083), timeout=5).close()
            return True
        except OSError:
            if time.time() - t0 >= deadline_s:
                return False
            time.sleep(15)


if __name__ == "__main__":
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not _wait_for_relay():
        # Honest failure, but carry the most recent CHIP-measured numbers
        # (benchmarks/exp_variants.py on the real v5e, 2026-08-17, recorded
        # in RESULTS.md "Model-family throughput") so a tunnel outage at
        # round end doesn't erase real measurements. `value` stays 0.0 —
        # nothing was measured by THIS run.
        # MAINTENANCE: these constants mirror RESULTS.md's model-family
        # table — update BOTH (and the date) whenever a newer chip
        # measurement lands; the "date" field tells consumers how stale
        # the fallback is.
        print(json.dumps({
            "metric": "cpc_pretrain_throughput", "value": 0.0,
            "unit": "audio-sec/sec/chip", "vs_baseline": 0.0,
            "error": "axon relay unreachable for 15 min (tunnel down; "
                     "see CLAUDE.md 'the axon relay can DIE mid-run')",
            "last_measured": {
                "date": "2026-08-17", "source": "RESULTS.md model-family "
                "table (real-chip exp_variants.py, same perf config)",
                "value": 9016.0, "scalogram_value": 11715.0,
                "transformer_value": 8346.0,
            },
        }))
        sys.exit(1)
    # The TPU is single-claim: if another process (a finishing probe or
    # study run) still holds it, backend init fails transiently. jax caches
    # a failed init for the life of the process, so retry by re-exec'ing
    # clean, bounded via an env counter (20 x 30 s = 10 min of patience).
    try:
        import jax
        jax.devices()
    except Exception:
        n = int(os.environ.get("BENCH_CLAIM_RETRIES", "0"))
        if n < 20:
            os.environ["BENCH_CLAIM_RETRIES"] = str(n + 1)
            time.sleep(30)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
    main()
