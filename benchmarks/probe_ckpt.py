"""Probe-only driver: run the probe_study battery on EXISTING checkpoints.

Why this exists: a long study keeps only the last N periodic checkpoints,
and its milestone grid is fixed at launch. When a milestone curve does
something interesting between two milestones (e.g. the 5.12 s dynamics
study rising to 13.6% at 16k then reading 9.8% at 24k), the periodic
checkpoints in between can densify the curve WITHOUT retraining — copy
them aside and point this script at them.

Usage:
  python benchmarks/probe_ckpt.py --workdir /tmp/dyn512_r3 \
      --checkpoints /tmp/dyn512_ckpt_bak --steps 20000,22000
The probe protocol is bit-identical to probe_study.py (shared
probe_milestone(); deterministic split seeds), so rows are directly
comparable with the study's own milestone rows.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_study import probe_milestone  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="study workdir holding config.json (the resolved "
                        "training config — probes must use its exact model "
                        "geometry and normalize flag)")
    p.add_argument("--checkpoints", default=None,
                   help="dir holding <step>/ orbax checkpoints "
                        "(default: <workdir>/checkpoints)")
    p.add_argument("--steps", required=True,
                   help="comma-separated checkpoint steps to probe")
    p.add_argument("--corpus", default=None,
                   help="probe corpus dir (default: the single corpus_* "
                        "dir inside --workdir, where probe_study puts its "
                        "generated corpus)")
    p.add_argument("--probe-seeds", type=int, default=3)
    args = p.parse_args()
    if args.corpus is None:
        import glob
        cands = sorted(glob.glob(os.path.join(args.workdir, "corpus_*")))
        if len(cands) != 1:
            raise SystemExit(
                f"--corpus not given and {args.workdir} holds "
                f"{len(cands)} corpus_* dirs: {cands}")
        args.corpus = cands[0]

    from cpc_tpu.config import from_dict
    from cpc_tpu.data.dataset import ProbeDataset, SnippetDataset
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.trainer import Trainer

    with open(os.path.join(args.workdir, "config.json")) as f:
        cfg = from_dict(json.load(f))
    # probe-only: no training steps, so skip the HBM corpus staging the
    # training config may have asked for
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, device_corpus=False))
    ckpt_root = args.checkpoints or os.path.join(args.workdir, "checkpoints")

    train_ds = SnippetDataset(args.corpus, cfg.data.snippet_samples)
    probe_ds = ProbeDataset(args.corpus, cfg.data.snippet_samples)
    model = CPCModel(cfg.model)
    results = []
    for step in (int(s) for s in args.steps.split(",")):
        src = os.path.join(ckpt_root, str(step))
        if not os.path.isdir(src):
            raise SystemExit(f"no checkpoint at {src}")
        # stage the one step into a scratch workdir so Trainer's
        # restore-latest resumes exactly it (and its retention policy
        # can't touch the originals)
        with tempfile.TemporaryDirectory() as tmp:
            shutil.copytree(src, os.path.join(tmp, cfg.train.checkpoint_dir,
                                              str(step)))
            tr = Trainer(cfg, train_ds, workdir=tmp)
            if not tr.maybe_resume() or tr.step != step:
                raise SystemExit(f"restore failed for step {step} "
                                 f"(got {tr.step})")
            row = {"step": step,
                   **probe_milestone(model, tr.params, probe_ds,
                                     normalize=cfg.data.normalize,
                                     probe_seeds=args.probe_seeds)}
            tr.close()
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
