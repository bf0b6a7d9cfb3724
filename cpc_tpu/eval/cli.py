"""Probe/eval CLI (SURVEY.md §4.3):

    python -m cpc_tpu.eval --config=baseline --workdir=runs/x \
        --probe=speaker --data=<corpus>

Loads the latest checkpoint from the workdir, freezes the model, and runs
the requested linear probe. `--probe=both` runs speaker + phone.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

from cpc_tpu.config import presets
from cpc_tpu.data.dataset import ProbeDataset
from cpc_tpu.data.synthetic import generate_synthetic_corpus
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.eval.probes import run_phone_probe, run_speaker_probe
from cpc_tpu.train.checkpoint import CheckpointManager
from cpc_tpu.train.train_step import init_state, make_step_fns


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cpc_tpu.eval")
    p.add_argument("--config", default=None,
                   help="preset name; default: the workdir's saved "
                        "config.json (the exact training config), falling "
                        "back to 'baseline'")
    p.add_argument("--workdir", required=True)
    p.add_argument("--data", default="synthetic")
    p.add_argument("--probe", default="both",
                   choices=["speaker", "phone", "both"])
    p.add_argument("--packed", action="store_true",
                   help="--data is a pre-decoded memmap corpus "
                        "(python -m cpc_tpu.data.pack)")
    p.add_argument("--feature", default="c", choices=["c", "z"])
    p.add_argument("--split", default="snippet", choices=["snippet", "file"],
                   help="probe train/eval split (speaker AND phone). 'file' "
                        "holds out whole utterances — the honest protocol "
                        "(the snippet split can score by per-recording "
                        "signatures; see RESULTS.md probe study)")
    p.add_argument("--battery", action="store_true",
                   help="run the FULL probe battery instead of single "
                        "probes: file-disjoint speaker under mean/last/max "
                        "pooling with multi-seed error bars, utterance "
                        "pooling, the snippet split for leak-size "
                        "comparison, and phone under both splits — the "
                        "protocol every RESULTS.md study row uses; prints "
                        "one JSON row")
    p.add_argument("--probe-seeds", type=int, default=3,
                   help="split seeds per battery column (mean ± std)")
    p.add_argument("--time-pool", default="mean",
                   choices=["mean", "last", "max"],
                   help="speaker-probe readout over the snippet's frames: "
                        "mean of the trajectory, final frame (integrated "
                        "evidence in a recurrent gar), or per-dim max "
                        "(strongest local evidence)")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--max-snippets", type=int, default=512)
    p.add_argument("--extract", default=None, metavar="AUDIO_FILE",
                   help="instead of probing: run the frozen model over this "
                        "wav/flac in sliding windows and write the (z, c) "
                        "trajectories (SURVEY.md §4.5 consumer API)")
    p.add_argument("--out", default=None,
                   help="output .npz for --extract (default: "
                        "<audio>.features.npz)")
    p.add_argument("--hop", type=int, default=None,
                   help="--extract sliding-window hop in samples (< window "
                        "gives overlapped windows with warm gar context; "
                        "default: window)")
    p.add_argument("--export-model", default=None, metavar="PATH",
                   help="instead of probing: bake the checkpoint into a "
                        "portable StableHLO serving artifact at PATH "
                        "(+ PATH.json sidecar) — see cpc_tpu/export.py")
    p.add_argument("--export-batch", type=int, default=None,
                   help="pin the artifact's batch dim (default: symbolic, "
                        "one artifact serves any batch size)")
    p.add_argument("--export-streaming", type=int, default=None,
                   metavar="N_LATENTS",
                   help="export the real-time streaming STEP (N_LATENTS "
                        "latents per fixed-shape call, GRU gar only) "
                        "instead of the windowed extractor")
    p.add_argument("--export-streams", type=int, default=1,
                   help="independent lockstep streams in the streaming "
                        "artifact (batched serving; default 1)")
    p.add_argument("--export-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="bake the weights in this dtype (bfloat16 halves "
                        "the artifact; ~1e-2 relative feature error). "
                        "Windowed extractor only")
    p.add_argument("--export-stats", type=float, nargs=2, default=None,
                   metavar=("MEAN", "STD"),
                   help="streaming export: bake a fixed (x-MEAN)/STD input "
                        "normalization into the step (a stream cannot "
                        "reproduce the per-snippet normalization most "
                        "presets train with — pass corpus-level stats or "
                        "the artifact sees raw samples)")
    args = p.parse_args(argv)

    streaming_export = args.export_streaming is not None
    if args.export_model is None:
        for flag, name in ((streaming_export, "--export-streaming"),
                           (args.export_streams != 1, "--export-streams"),
                           (args.export_batch is not None, "--export-batch"),
                           (args.export_dtype is not None, "--export-dtype"),
                           (args.export_stats is not None, "--export-stats")):
            if flag:
                p.error(f"{name} requires --export-model")
    elif streaming_export:
        # flags that only shape the WINDOWED artifact must not be
        # silently dropped in streaming mode
        for flag, name in ((args.export_batch is not None, "--export-batch"),
                           (args.export_dtype is not None, "--export-dtype")):
            if flag:
                p.error(f"{name} applies to the windowed extractor, not "
                        "--export-streaming")
    elif args.export_stats is not None:
        p.error("--export-stats applies to --export-streaming (the "
                "windowed extractor bakes the training-matched per-window "
                "normalization automatically)")

    saved = os.path.join(args.workdir, "config.json")
    if args.config is not None:
        cfg = presets.by_name(args.config)
    elif os.path.exists(saved):
        from cpc_tpu.config import from_dict
        with open(saved) as f:
            cfg = from_dict(json.load(f))
    else:
        cfg = presets.by_name("baseline")
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model, mesh=None)
    params, opt_state = init_state(cfg, model, steps.optimizer)

    ckpt_dir = os.path.join(args.workdir, cfg.train.checkpoint_dir)
    restored = CheckpointManager(ckpt_dir).restore_latest(params, opt_state)
    if restored is None:
        print(json.dumps({"warning": f"no checkpoint under {ckpt_dir}; "
                          "probing a randomly initialized model"}))
        step = 0
    else:
        params, _, step, _ = restored

    if args.export_model:
        from cpc_tpu.config import to_dict
        from cpc_tpu.export import (export_extractor, export_streaming_step,
                                    save_artifact)
        if args.export_streaming is not None:
            if cfg.data.normalize and args.export_stats is None:
                print(json.dumps({"warning": (
                    "this config trains on per-snippet-NORMALIZED input, "
                    "which a stream cannot reproduce; the streaming "
                    "artifact will see raw samples. Pass --export-stats "
                    "MEAN STD (corpus-level) to bake a fixed input "
                    "normalization")}))
            exp = export_streaming_step(model, params,
                                        chunk_latents=args.export_streaming,
                                        n_streams=args.export_streams,
                                        stats=args.export_stats)
        else:
            exp = export_extractor(model, params,
                                   snippet_samples=cfg.data.snippet_samples,
                                   batch=args.export_batch,
                                   normalize=cfg.data.normalize,
                                   params_dtype=args.export_dtype)
        sidecar = save_artifact(args.export_model, exp,
                                meta={"checkpoint_step": step,
                                      "config": to_dict(cfg)})
        print(json.dumps({"checkpoint_step": step,
                          "export": args.export_model,
                          "platforms": sidecar["platforms"],
                          "in_avals": sidecar["in_avals"],
                          "out_avals": sidecar["out_avals"],
                          "bytes": sidecar["bytes"]}))
        return 0

    if args.extract:
        import numpy as np
        from cpc_tpu.data.dataset import decode_mono
        from cpc_tpu.eval.features import extract_features
        wave, _ = decode_mono(args.extract, cfg.data.sample_rate)
        z, c = extract_features(model, params, wave.astype(np.float32),
                                window=cfg.data.snippet_samples,
                                hop=args.hop,
                                normalize=cfg.data.normalize)
        out = args.out or args.extract + ".features.npz"
        np.savez(out, z=z, c=c)
        print(json.dumps({"checkpoint_step": step, "extract": args.extract,
                          "out": out, "z_shape": list(z.shape),
                          "c_shape": list(c.shape)}))
        return 0

    if args.data == "synthetic":
        corpus = os.path.join(args.workdir, "synthetic_corpus")
        if not os.path.isdir(corpus):
            generate_synthetic_corpus(corpus, num_speakers=8,
                                      files_per_speaker=3,
                                      seconds_per_file=4.0, seed=0)
    else:
        corpus = args.data
    if args.packed:
        from cpc_tpu.data.packed import PackedSnippetDataset
        ds = PackedSnippetDataset(corpus, cfg.data.snippet_samples,
                                  cfg.data.snippet_samples,
                                  cfg.data.sample_rate)
    else:
        ds = ProbeDataset(corpus, cfg.data.snippet_samples,
                          cfg.data.snippet_samples, cfg.data.sample_rate)

    if args.battery:
        from cpc_tpu.eval.battery import probe_milestone
        row = {"checkpoint_step": step,
               **probe_milestone(model, params, ds,
                                 normalize=cfg.data.normalize,
                                 probe_seeds=args.probe_seeds)}
        print(json.dumps(row))
        return 0

    results = {"checkpoint_step": step, "feature": args.feature}
    if args.probe in ("speaker", "both"):
        r = run_speaker_probe(model, params, ds, feature=args.feature,
                              steps=args.steps,
                              max_snippets=args.max_snippets,
                              normalize=cfg.data.normalize,
                              split=args.split, time_pool=args.time_pool)
        results["speaker_probe"] = dataclasses.asdict(r)
    if args.probe in ("phone", "both"):
        r = run_phone_probe(model, params, ds, feature=args.feature,
                            steps=args.steps,
                            max_snippets=args.max_snippets,
                            normalize=cfg.data.normalize,
                            split=args.split)
        results["phone_probe"] = dataclasses.asdict(r)
    print(json.dumps(results))
    return 0
