"""Scaled probe study (VERDICT r1 #7): 32 speakers, >=200-item eval splits,
accuracy-vs-training-steps curve.

Protocol (documented in RESULTS.md):
  * corpus: synthetic LibriSpeech-layout, 32 speakers x 4 files x 8 s
    (~800 snippets of 1.28 s) with per-sample phone labels;
  * pretrain the tpu_fast config (batch 64 bf16, fused loss) on it,
    checkpointing at the probe milestones;
  * at each milestone: frozen-encoder linear probes — speaker-ID on
    mean-pooled c (max 800 snippets, 25% eval => 200 eval items), phone on
    per-frame z;
  * a real corpus is a drop-in: point --data at LibriSpeech wav/flac dirs
    (speaker = top-level dir); for phones, dump forced alignments as
    <utt>.phones.npy int per-sample label files next to the audio.

Run: python benchmarks/probe_study.py [--steps 500,1000,2000,4000]
Prints one JSON line per milestone and a summary line.
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


# probe_milestone was promoted to the package (r3) so the eval CLI and the
# study drivers share ONE battery implementation; re-exported here because
# probe_ckpt.py and older logs/tooling import it from this module.
from cpc_tpu.eval.battery import probe_milestone  # noqa: E402,F401


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--milestones", default="0,500,1000,2000,4000")
    p.add_argument("--corpus", default=None,
                   help="existing corpus dir (default: generate synthetic)")
    p.add_argument("--style", default="speech", choices=["speech", "dynamics"],
                   help="'dynamics' hides speaker identity in phone-"
                        "transition statistics (uniform stationary dist), so "
                        "the speaker probe measures learned temporal "
                        "structure, not static spectra")
    p.add_argument("--speakers", type=int, default=32)
    p.add_argument("--files-per-speaker", type=int, default=4)
    p.add_argument("--seconds-per-file", type=float, default=8.0)
    p.add_argument("--augment", action="store_true",
                   help="on-device gain/noise/shift augmentation (curbs "
                        "overfit on the small synthetic corpus)")
    p.add_argument("--negatives", default=None,
                   choices=["same_step", "all_steps"],
                   help="override the loss pool. same_step negatives all "
                        "come from OTHER utterances, so InfoNCE is solvable "
                        "by matching per-utterance signatures (f0) — the "
                        "classic CPC shortcut. all_steps adds same-utterance "
                        "candidates, forcing temporal content")
    p.add_argument("--snippet-samples", type=int, default=None,
                   help="override cfg.data.snippet_samples (e.g. 40960 = "
                        "2.56 s: ~18 phone transitions per snippet instead "
                        "of ~9, doubling the evidence available to the "
                        "context representation)")
    p.add_argument("--batch", type=int, default=None,
                   help="override cfg.data.batch_size (e.g. halve it when "
                        "doubling snippet length so audio/step and the "
                        "B*T all_steps pool stay constant across a "
                        "context-scaling comparison)")
    p.add_argument("--ar", default=None, choices=["gru", "transformer"],
                   help="context-network family (default: the tpu_fast "
                        "preset's Pallas GRU). transformer = 2-layer causal "
                        "blocks over the flash-attention kernel "
                        "(ops/attention_pallas.py) — the architecture axis "
                        "of the dynamics study at long context")
    p.add_argument("--d-ar", type=int, default=None,
                   help="override gar width (GRU hidden / transformer "
                        "d_model; baseline 256). The model-width lever of "
                        "the dynamics study: more context state for the "
                        "same audio")
    p.add_argument("--d-enc", type=int, default=None,
                   help="override encoder width: every conv channel AND the "
                        "latent dim d_enc (baseline 512)")
    p.add_argument("--device-corpus", action="store_true",
                   help="HBM-resident corpus + on-device batch gather: no "
                        "per-step host transfers (the axon tunnel retains "
                        "every staged transfer payload — a 24k-step batch-64 "
                        "run otherwise leaks >100 GB of host RSS and gets "
                        "OOM-killed; docs/DESIGN.md)")
    p.add_argument("--probe-seeds", type=int, default=3,
                   help="probe train/eval-split seeds per milestone; "
                        "speaker_acc is reported mean +/- std across them")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="PATH=VAL",
                   help="dotted-path config override applied last (e.g. "
                        "--set model.ar.attn_impl=flash16) — "
                        "cpc_tpu.config.apply_overrides")
    p.add_argument("--workdir", default="/tmp/probe_study")
    args = p.parse_args()
    milestones = sorted(int(s) for s in args.milestones.split(","))

    from cpc_tpu.config import presets
    from cpc_tpu.data.dataset import ProbeDataset, SnippetDataset
    from cpc_tpu.data.synthetic import generate_synthetic_corpus
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.trainer import Trainer

    cfg = presets.tpu_fast()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, augment=args.augment,
            device_corpus=args.device_corpus,
            batch_size=(args.batch or cfg.data.batch_size),
            snippet_samples=(args.snippet_samples
                             or cfg.data.snippet_samples)),
        train=dataclasses.replace(cfg.train, num_steps=milestones[-1],
                                  log_every=200, eval_every=10**9,
                                  checkpoint_every=2000),
    )
    if args.ar == "transformer":
        from cpc_tpu.config import ArConfig
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, ar=ArConfig(kind="transformer",
                                   d_ar=cfg.model.ar.d_ar,
                                   num_layers=2, num_heads=8, max_len=4096,
                                   attn_impl="flash")))
    if args.d_ar or args.d_enc:
        mdl = cfg.model
        if args.d_ar:
            mdl = dataclasses.replace(mdl, ar=dataclasses.replace(
                mdl.ar, d_ar=args.d_ar))
        if args.d_enc:
            enc = mdl.encoder
            mdl = dataclasses.replace(mdl, encoder=dataclasses.replace(
                enc, channels=tuple(args.d_enc for _ in enc.channels),
                d_enc=args.d_enc))
        cfg = dataclasses.replace(cfg, model=mdl)
    if args.negatives:
        # fuse_heads is same_step-only; make_step_fns falls back to the
        # (streaming Pallas) all-steps path automatically
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, loss=dataclasses.replace(
                cfg.model.loss, negatives=args.negatives)))
    if args.overrides:
        from cpc_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, args.overrides)

    corpus = args.corpus
    if corpus is None:
        # dir keyed by EVERY generation parameter: a cached corpus built
        # with different flags must never be silently reused (the silent-
        # reuse bug class that once served the easy corpus to a dynamics
        # study)
        corpus = os.path.join(
            args.workdir,
            f"corpus_{args.style}_{args.speakers}x{args.files_per_speaker}"
            f"x{args.seconds_per_file:g}s")
        if not os.path.isdir(corpus):
            generate_synthetic_corpus(
                corpus, style=args.style, num_speakers=args.speakers,
                files_per_speaker=args.files_per_speaker,
                seconds_per_file=args.seconds_per_file, seed=123)
    train_ds = SnippetDataset(corpus, cfg.data.snippet_samples)
    probe_ds = ProbeDataset(corpus, cfg.data.snippet_samples)
    print(json.dumps({"corpus_snippets": len(train_ds),
                      "speakers": probe_ds.num_speakers}), flush=True)

    model = CPCModel(cfg.model)
    tr = Trainer(cfg, train_ds, workdir=args.workdir)
    # long studies (hours at 5.12 s snippets) must survive a crash: resume
    # from the latest periodic checkpoint. Milestones BELOW the restored
    # step are skipped (their rows are in the log); a milestone exactly AT
    # the restored step is re-probed deliberately — the crash may have
    # landed between its checkpoint and its probe, and re-probing is
    # idempotent (deterministic split seeds)
    if tr.maybe_resume():
        print(json.dumps({"resumed_at": tr.step}), flush=True)
    results = []
    prev = tr.step
    milestones = [m for m in milestones if m >= tr.step]
    for ms in milestones:
        if ms > prev:
            t0 = time.time()
            tr.train(ms)
            if tr.preempted:
                # graceful SIGTERM: the Trainer checkpointed at the
                # interrupt step; exit instead of probing at a mislabeled
                # milestone (a rerun resumes from the checkpoint)
                print(json.dumps({"preempted_at": tr.step}), flush=True)
                tr.close()
                # EX_TEMPFAIL, not 0: watchdog.sh infers completion from
                # rc==0 — an externally-delivered graceful SIGTERM must
                # read as "restart me; I resume from the checkpoint", not
                # as the study finishing (review r4). The deadline guard's
                # stop file is what makes a preemption final.
                sys.exit(75)
            print(json.dumps({"trained_to": ms,
                              "secs": round(time.time() - t0, 1)}),
                  flush=True)
            prev = ms
        row = {"step": ms,
               **probe_milestone(model, tr.params, probe_ds,
                                 normalize=cfg.data.normalize,
                                 probe_seeds=args.probe_seeds)}
        results.append(row)
        print(json.dumps(row), flush=True)
    tr.close()
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
