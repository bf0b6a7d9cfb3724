"""Summarize a probe study: workdir/log -> the RESULTS.md milestone table.

The dynamics studies (benchmarks/probe_study.py) print one JSON row per
milestone to stdout and stream train metrics to <workdir>/metrics.jsonl.
This tool collects both (a study interrupted and resumed under the
watchdog pattern leaves rows scattered across several log files — pass
them all) and emits the exact markdown table RESULTS.md uses, plus a
train-throughput line, so a writeup is a copy-paste instead of a
hand-transcription.

Usage:
  python benchmarks/study_summary.py --workdir /tmp/dyn1024_r3 \
      [--logs /tmp/dyn1024_r3.log /tmp/dyn1024_ext.log]
Milestone rows are read from the logs if given, else from
<workdir>/milestones.jsonl if present; duplicates (a re-probed milestone
after resume) keep the LAST occurrence.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def collect_rows(paths):
    """Milestone probe rows (dicts with speaker_file_acc) from mixed-content
    log files; later duplicates of a step win."""
    rows = {}
    for path in paths:
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "speaker_file_acc" in d and "step" in d:
                    rows[int(d["step"])] = d
    return [rows[s] for s in sorted(rows)]


def fmt_pct(x, std=None):
    if std is None:
        return f"{100 * x:.1f}%"
    return f"{100 * x:.1f} ± {100 * std:.1f}%"


def markdown_table(rows):
    # max-pool column only exists in batteries run after it was added;
    # older rows render without it
    has_max = any("speaker_file_max_acc" in d for d in rows)
    hdr = ["steps", "file-split speaker", "utt-pooled", "last-frame"]
    if has_max:
        hdr.append("max-pool")
    hdr += ["snippet-split", "phone (file)"]
    out = ["| " + " | ".join(hdr) + " |", "|" + "---|" * len(hdr)]
    for d in rows:
        cells = [f"{d['step']:,}".replace(",", " "),
                 fmt_pct(d["speaker_file_acc"],
                         d.get("speaker_file_acc_std")),
                 fmt_pct(d["speaker_utt_acc"]),
                 fmt_pct(d["speaker_file_last_acc"],
                         d.get("speaker_file_last_acc_std"))]
        if has_max:
            cells.append(
                fmt_pct(d["speaker_file_max_acc"],
                        d.get("speaker_file_max_acc_std"))
                if "speaker_file_max_acc" in d else "—")
        cells += [fmt_pct(d["speaker_acc"]), fmt_pct(d["phone_file_acc"])]
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out)


def train_summary(workdir):
    path = os.path.join(workdir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    last = None
    rates = []
    with open(path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get("prefix") == "train":
                last = d
                if "audio_sec_per_sec" in d:
                    rates.append(d["audio_sec_per_sec"])
    if last is None:
        return None
    mid = sorted(rates)[len(rates) // 2] if rates else float("nan")
    return {"last_step": last["step"], "last_loss": round(last["loss"], 3),
            "last_acc_mean": round(last["acc_mean"], 4),
            "median_audio_sec_per_sec": round(mid, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--logs", nargs="*", default=None,
                   help="stdout logs holding the milestone JSON rows "
                        "(default: <workdir>/milestones.jsonl)")
    args = p.parse_args()
    logs = args.logs or [os.path.join(args.workdir, "milestones.jsonl")]
    rows = collect_rows(logs)
    if not rows:
        raise SystemExit(f"no milestone rows found in {logs}")
    cfgp = os.path.join(args.workdir, "config.json")
    if os.path.exists(cfgp):
        with open(cfgp) as f:
            cfg = json.load(f)
        print(json.dumps({
            "snippet_samples": cfg["data"]["snippet_samples"],
            "snippet_sec": cfg["data"]["snippet_samples"]
            / cfg["data"]["sample_rate"],
            "batch": cfg["data"]["batch_size"],
            "pool": cfg["data"]["batch_size"]
            * (cfg["data"]["snippet_samples"] // 160),
            "d_ar": cfg["model"]["ar"]["d_ar"],
            "negatives": cfg["model"]["loss"]["negatives"],
        }))
    ts = train_summary(args.workdir)
    if ts:
        print(json.dumps(ts))
    print(markdown_table(rows))


if __name__ == "__main__":
    main()
