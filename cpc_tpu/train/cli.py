"""CLI entry point: `python -m cpc_tpu.train --config=baseline ...`
(SURVEY.md §6.6 — the reference has edit-in-place config dicts and no CLI;
every BASELINE config ships here as a named preset).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from cpc_tpu.config import presets
from cpc_tpu.data.dataset import SnippetDataset
from cpc_tpu.data.synthetic import generate_synthetic_corpus
from cpc_tpu.parallel import multihost
from cpc_tpu.train import supervisor
from cpc_tpu.train.trainer import Trainer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cpc_tpu.train",
        description="TPU-native CPC audio pretraining",
        # no abbreviations: --superv would dodge the supervisor's flag
        # stripping and spawn supervisors recursively
        allow_abbrev=False,
    )
    p.add_argument("--config", default=None,
                   help="preset name (baseline, maestro_scalogram, "
                        "transformer_gar, dp_global_negatives, tpu_fast). "
                        "Default: baseline — except with --resume, where "
                        "the workdir's persisted config.json (the exact "
                        "config of the interrupted run) is used, so a bare "
                        "'--workdir X --resume' continues faithfully; "
                        "explicit flags still override")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic', 'synthetic-music', or a corpus directory")
    p.add_argument("--val-data", default=None,
                   help="validation corpus directory (defaults to --data)")
    p.add_argument("--packed", action="store_true",
                   help="--data/--val-data point at pre-decoded memmap "
                        "corpora (python -m cpc_tpu.data.pack) — zero host "
                        "decode during training")
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--steps", type=int, default=None,
                   help="override train.num_steps")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--snippet-samples", type=int, default=None,
                   help="override data.snippet_samples (e.g. 40960 = 2.56 s "
                        "at 16 kHz — longer context is the measured lever "
                        "for cross-utterance structure; see RESULTS.md)")
    p.add_argument("--augment", action="store_true",
                   help="on-device waveform augmentation (gain/noise/shift/"
                        "polarity) inside the jitted step")
    p.add_argument("--device-corpus", action="store_true",
                   help="upload the whole int16 corpus to HBM once and "
                        "feed steps (B,) index vectors (on-device gather): "
                        "no per-step batch transfers. Single-device, "
                        "corpus must fit HBM")
    p.add_argument("--lr-schedule", default=None,
                   choices=["constant", "cosine"],
                   help="override train.lr_schedule (cosine decays to 0 "
                        "over num_steps; composes with warmup)")
    p.add_argument("--grad-clip", type=float, default=None,
                   help="override train.grad_clip_norm (clip grads to this "
                        "global norm before Adam; 0 disables)")
    p.add_argument("--accum-steps", type=int, default=None,
                   help="override train.accum_steps (microbatches per "
                        "optimizer step; each microbatch is its own "
                        "negative pool)")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in workdir")
    p.add_argument("--supervise", action="store_true",
                   help="run training as a supervised child process: on a "
                        "crash (nonzero exit) OR a hang (workdir heartbeat "
                        "stale for --stale-after; e.g. a dead device tunnel "
                        "blocks forever with zero CPU) the child is "
                        "terminated and relaunched with --resume. Restart "
                        "budget counts CONSECUTIVE no-progress failures "
                        "(any new checkpoint resets it)")
    p.add_argument("--stale-after", type=float,
                   default=supervisor.DEFAULT_STALE_AFTER,
                   help="seconds of workdir silence (no metrics.jsonl / "
                        "checkpoint writes) before a supervised child is "
                        "declared hung; must exceed the longest legitimate "
                        "quiet period (first compile, validation pass)")
    p.add_argument("--max-restarts", type=int,
                   default=supervisor.DEFAULT_MAX_RESTARTS,
                   help="consecutive no-progress restarts before the "
                        "supervisor gives up")
    p.add_argument("--distributed", action="store_true",
                   help="multi-process (multi-host) run: jax.distributed "
                        "bring-up with platform autodetection (TPU pods "
                        "discover the coordinator and topology themselves); "
                        "launch the SAME command on every host. Workdir "
                        "must be shared (or synced) for checkpoints")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="explicit jax.distributed coordinator (implies "
                        "--distributed; for CPU rehearsal / non-TPU "
                        "clusters). Requires --num-processes/--process-id")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--profile", action="store_true",
                   help="wrap training in a jax.profiler trace "
                        "(written to <workdir>/profile)")
    p.add_argument("--set", action="append", default=[], metavar="PATH=VAL",
                   dest="overrides",
                   help="override any config field by dotted path, e.g. "
                        "--set model.ar.attn_impl=flash16 "
                        "--set train.learning_rate=3e-4 "
                        "--set model.encoder.channels=256,256,512; applied "
                        "last (wins over the preset and dedicated flags); "
                        "repeatable")
    p.add_argument("--nan-debug", action="store_true",
                   help="raise on the first NaN inside jitted code")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.coordinator is not None and (args.num_processes is None
                                         or args.process_id is None):
        raise SystemExit("--coordinator requires --num-processes and "
                         "--process-id")
    if args.supervise:
        # re-exec this same command under crash/hang supervision; the child
        # runs the normal path below (no --supervise)
        return supervisor.supervise_cli(args, argv)
    if args.distributed or args.coordinator is not None:
        # before ANY jax device use: the Trainer's mesh must see the
        # GLOBAL device set
        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id)
    saved = os.path.join(args.workdir, "config.json")
    if args.config is not None:
        cfg = presets.by_name(args.config)
    elif args.resume and os.path.exists(saved):
        import json
        from cpc_tpu.config import from_dict
        with open(saved) as f:
            cfg = from_dict(json.load(f))
    else:
        cfg = presets.by_name("baseline")
    if args.steps is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, num_steps=args.steps))
    if args.seed is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, seed=args.seed))
    if args.batch_size is not None:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=args.batch_size))
    if args.snippet_samples is not None:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          snippet_samples=args.snippet_samples))
    if args.augment:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, augment=True))
    if args.device_corpus:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, device_corpus=True))
    for flag, field in ((args.lr_schedule, "lr_schedule"),
                        (args.grad_clip, "grad_clip_norm"),
                        (args.accum_steps, "accum_steps")):
        if flag is not None:
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, **{field: flag}))
    if args.overrides:
        from cpc_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, args.overrides)

    if args.data in ("synthetic", "synthetic-music"):
        corpus = os.path.join(args.workdir, "synthetic_corpus")
        # multi-process: only process 0 writes the shared workdir (the
        # isdir check is not an inter-process lock), everyone else waits
        if not os.path.isdir(corpus) and (not multihost.active()
                                          or multihost.is_main()):
            style = "music" if args.data.endswith("music") else "speech"
            generate_synthetic_corpus(
                corpus, style=style,
                num_speakers=max(8, cfg.data.batch_size),
                files_per_speaker=3, seconds_per_file=4.0,
                seed=cfg.train.seed)
        if multihost.active():
            multihost.barrier("synthetic-corpus")
    else:
        corpus = args.data
    val_corpus = args.val_data or corpus

    if args.packed:
        from cpc_tpu.data.packed import PackedSnippetDataset
        train_ds = PackedSnippetDataset(corpus, cfg.data.snippet_samples,
                                        cfg.data.snippet_stride,
                                        cfg.data.sample_rate)
        val_ds = PackedSnippetDataset(val_corpus, cfg.data.snippet_samples,
                                      cfg.data.snippet_samples,
                                      cfg.data.sample_rate)
    else:
        train_ds = SnippetDataset(corpus, cfg.data.snippet_samples,
                                  cfg.data.snippet_stride,
                                  cfg.data.sample_rate)
        val_ds = SnippetDataset(val_corpus, cfg.data.snippet_samples,
                                cfg.data.snippet_samples,
                                cfg.data.sample_rate)

    trainer = Trainer(cfg, train_ds, val_ds, workdir=args.workdir)
    if args.resume:
        resumed = trainer.maybe_resume()
        print(f"resume: {'restored step ' + str(trainer.step) if resumed else 'no checkpoint found'}")
    print(f"config={cfg.name} devices={trainer.mesh.size} "
          f"batch={cfg.data.batch_size} steps={cfg.train.num_steps}")
    if args.nan_debug:
        from cpc_tpu.utils.profiling import enable_nan_debug
        enable_nan_debug()
    if args.profile:
        from cpc_tpu.utils.profiling import trace
        with trace(os.path.join(args.workdir, "profile")):
            trainer.train()
    else:
        trainer.train()
    trainer.close()
    return 0
