"""Train-CLI surface (SURVEY.md §6.6): flags change the run they advertise."""

import json
import os

from cpc_tpu.train.cli import main as train_main


def test_train_cli_overrides(tmp_path):
    wd = str(tmp_path / "run")
    rc = train_main([
        "--config=baseline", "--data=synthetic", f"--workdir={wd}",
        "--steps=2", "--batch-size=8", "--snippet-samples=4000",
        "--seed=3",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in
             open(os.path.join(wd, "metrics.jsonl"))]
    assert lines[-1]["step"] == 2
    # 4000-sample snippets at 160x -> 25 latents; metrics carry per-k acc
    assert len(lines[-1]["acc"]) == 12
    # checkpoint written at the final step; resume restores it
    rc = train_main([
        "--config=baseline", "--data=synthetic", f"--workdir={wd}",
        "--steps=2", "--batch-size=8", "--snippet-samples=4000",
        "--resume",
    ])
    assert rc == 0
