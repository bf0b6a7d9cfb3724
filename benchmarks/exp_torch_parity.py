"""The BASELINE.json:5 acceptance run: train the reference-architecture
PyTorch oracle and the cpc_tpu baseline config on IDENTICAL batches from
identical init, and measure whether k-step InfoNCE accuracy agrees within
1% (VERDICT r3 next #1 — the last unexecuted clause of the acceptance
criterion).

    env -u PALLAS_AXON_POOL_IPS python benchmarks/exp_torch_parity.py \
        [--steps 400] [--negatives same_step]

Protocol:
  * config: the `baseline` preset (BASELINE.json:7 — batch 8, fp32,
    20480-sample snippets, K=12, Adam 2e-4) with encoder.padding='VALID'
    (torch Conv1d's native padding — the reference's semantics; the SAME
    default exists for the TPU-side 128-latent contract);
  * data: deterministic synthetic speech corpus -> the production
    SnippetDataset/Batcher stream, captured once as int16 arrays and fed
    verbatim to BOTH frameworks;
  * init: CPCModel.init exported through interop.to_torch_state_dict, so
    both sides start at the same point (forward parity of that mapping is
    pinned to 1e-4 by tests/test_interop.py);
  * both sides run fp32 on CPU (this host pins jax to CPU below; two SGD
    trajectories on one machine, only the framework differs).

Prints one JSON row per log interval and a final summary line with the
acceptance numbers (see tests/torch_oracle.py::compare_trajectories).
Results are recorded in RESULTS.md "Torch training parity".
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the sitecustomize imports jax at interpreter start, so env vars alone
# don't flip the platform; jax.config before first backend use does
# (tests/conftest.py pattern). The parity run is a CPU fp32 experiment —
# it must neither claim the TPU nor route through bf16 defaults.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--negatives", default="same_step",
                    choices=["same_step", "all_steps"])
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import torch

    from cpc_tpu.config import presets
    from cpc_tpu.data.dataset import SnippetDataset
    from cpc_tpu.data.loader import Batcher
    from cpc_tpu.data.synthetic import generate_synthetic_corpus
    from cpc_tpu.models.cpc import CPCModel
    from tests.torch_oracle import (TorchCPC, compare_trajectories,
                                    load_cpc_params_into_torch, train_jax,
                                    train_torch)

    cfg = presets.baseline()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            encoder=dataclasses.replace(cfg.model.encoder, padding="VALID"),
            loss=dataclasses.replace(cfg.model.loss,
                                     negatives=args.negatives)))
    print(json.dumps({"config": cfg.name, "padding": "VALID",
                      "negatives": args.negatives, "batch":
                      cfg.data.batch_size, "steps": args.steps}), flush=True)

    with tempfile.TemporaryDirectory() as root:
        generate_synthetic_corpus(root, num_speakers=8, files_per_speaker=2,
                                  seconds_per_file=12.0, seed=args.seed)
        ds = SnippetDataset(root, cfg.data.snippet_samples,
                            sample_rate=cfg.data.sample_rate)
        batcher = Batcher(ds, cfg.data.batch_size, shuffle=True,
                          seed=cfg.train.seed, prefetch=1,
                          transfer_dtype="int16")
        it = iter(batcher)
        batches = [np.array(next(it)[2], copy=True)
                   for _ in range(args.steps)]
    print(json.dumps({"corpus_snippets": len(ds),
                      "batch_bytes": batches[0].nbytes}), flush=True)

    model = CPCModel(cfg.model)
    variables = model.init(jax.random.key(args.seed),
                           np.zeros((1, cfg.data.snippet_samples),
                                    np.float32))
    tm = TorchCPC(cfg)
    load_cpc_params_into_torch(variables, cfg, tm)
    torch.manual_seed(0)
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    t0 = time.time()
    jax_rows = train_jax(cfg, variables, batches)
    t_jax = time.time() - t0
    print(json.dumps({"side": "jax_done", "secs": round(t_jax, 1)}),
          flush=True)
    t0 = time.time()
    torch_rows = train_torch(cfg, tm, batches)
    t_torch = time.time() - t0
    print(json.dumps({"side": "torch_done", "secs": round(t_torch, 1)}),
          flush=True)

    for i in range(0, args.steps, args.log_every):
        print(json.dumps({
            "step": i,
            "jax_loss": round(jax_rows[i]["loss"], 5),
            "torch_loss": round(torch_rows[i]["loss"], 5),
            "jax_acc1": round(jax_rows[i]["acc"][0], 4),
            "torch_acc1": round(torch_rows[i]["acc"][0], 4),
        }), flush=True)

    rep = compare_trajectories(jax_rows, torch_rows)
    rep["negatives"] = args.negatives
    rep["jax_secs"] = round(t_jax, 1)
    rep["torch_secs"] = round(t_torch, 1)
    rep["pass_1pct"] = bool(rep["acc_abs_diff_max_pct"] < 1.0)
    print(json.dumps({"summary": rep}), flush=True)


if __name__ == "__main__":
    main()
