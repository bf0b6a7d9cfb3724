"""One training process of a multi-process CPU rehearsal run; spawned by
tests/test_multihost.py (NOT a pytest file). Prints one JSON line per
logged step from the main process."""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--steps", type=int, required=True)
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--eval-every", type=int, default=10**9)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--parallel", default="dp", choices=["dp", "dpcp"])
    p.add_argument("--device-corpus", action="store_true")
    args = p.parse_args()

    if args.nprocs > 1:
        from cpc_tpu.parallel import multihost
        multihost.initialize(f"127.0.0.1:{args.port}",
                             num_processes=args.nprocs,
                             process_id=args.pid)

    from cpc_tpu.config import presets
    from cpc_tpu.data.dataset import SnippetDataset
    from cpc_tpu.train.trainer import Trainer

    cfg = presets.by_name("baseline")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            encoder=dataclasses.replace(cfg.model.encoder,
                                        channels=(16, 16, 16),
                                        kernels=(10, 8, 4),
                                        strides=(5, 4, 2), d_enc=16),
            ar=dataclasses.replace(cfg.model.ar, d_ar=16)),
        data=dataclasses.replace(cfg.data, batch_size=8,
                                 snippet_samples=2000,
                                 device_corpus=args.device_corpus),
        train=dataclasses.replace(cfg.train, num_steps=args.steps,
                                  log_every=1, eval_every=args.eval_every,
                                  checkpoint_every=args.ckpt_every),
    )
    if args.parallel == "dpcp":
        # 2-D data x ctx rehearsal: batch rows contributed per process
        # along 'data', the InfoNCE/attention rings within each process's
        # 4 devices along 'ctx'. snippet 3200 / ctx 4 / stride 40 = 20
        # latents per chunk (integers all the way down the conv pyramid).
        from cpc_tpu.config import ArConfig
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                ar=ArConfig(kind="transformer", d_ar=16, num_layers=1,
                            num_heads=2, max_len=128),
                loss=dataclasses.replace(cfg.model.loss,
                                         negatives="all_steps")),
            data=dataclasses.replace(cfg.data, snippet_samples=3200),
            train=dataclasses.replace(cfg.train, parallel="dpcp",
                                      mesh_shape=(2, 4),
                                      mesh_axes=("data", "ctx")),
        )
    ds = SnippetDataset(args.corpus, cfg.data.snippet_samples)
    val_ds = (SnippetDataset(args.corpus, cfg.data.snippet_samples)
              if args.eval_every < 10**9 else None)
    tr = Trainer(cfg, ds, val_ds, workdir=args.workdir)
    resumed = tr.maybe_resume() if args.resume else False
    tr.train(args.steps)
    tr.close()
    if args.pid == 0:
        print(json.dumps({"done": tr.step, "resumed": bool(resumed),
                          "procs": jax.process_count(),
                          "devices": jax.device_count()}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
