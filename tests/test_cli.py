"""Train-CLI surface (SURVEY.md §6.6): flags change the run they advertise."""

import json
import os

from cpc_tpu.train.cli import main as train_main


def test_train_cli_overrides(tmp_path):
    wd = str(tmp_path / "run")
    rc = train_main([
        "--config=baseline", "--data=synthetic", f"--workdir={wd}",
        "--steps=2", "--batch-size=16", "--snippet-samples=4000",
        "--seed=3", "--lr-schedule=cosine", "--grad-clip=1.0",
        "--accum-steps=2",  # local batch 2 on the 8-device mesh -> 2 micro
    ])
    assert rc == 0
    lines = [json.loads(l) for l in
             open(os.path.join(wd, "metrics.jsonl"))]
    assert lines[-1]["step"] == 2
    # the persisted config carries the optimizer overrides
    saved = json.load(open(os.path.join(wd, "config.json")))["train"]
    assert (saved["lr_schedule"], saved["grad_clip_norm"],
            saved["accum_steps"]) == ("cosine", 1.0, 2)
    # 4000-sample snippets at 160x -> 25 latents; metrics carry per-k acc
    assert len(lines[-1]["acc"]) == 12
    # checkpoint written at the final step; a bare --resume restores it
    # AND the persisted config (batch/snippet/optimizer chain — a plain
    # preset would even mismatch the checkpointed chain(clip, adam) state)
    rc = train_main(["--data=synthetic", f"--workdir={wd}", "--resume"])
    assert rc == 0


def test_config_roundtrip_and_eval_autoload(tmp_path):
    """The Trainer persists the RESOLVED config; from_dict restores the
    exact frozen tree (tuples included); eval with no --config uses it."""
    import dataclasses
    from cpc_tpu.config import from_dict, presets, to_dict

    cfg = presets.tpu_fast()
    cfg2 = from_dict(json.loads(json.dumps(to_dict(cfg))))
    assert cfg2 == cfg
    assert isinstance(cfg2.model.encoder.kernels, tuple)
    try:
        from_dict({"bogus_key": 1})
    except ValueError as e:
        assert "bogus_key" in str(e)
    else:
        raise AssertionError("unknown keys must raise")

    wd = str(tmp_path / "run")
    train_main([
        "--config=baseline", "--data=synthetic", f"--workdir={wd}",
        "--steps=1", "--batch-size=8", "--snippet-samples=4000",
    ])
    saved = from_dict(json.load(open(os.path.join(wd, "config.json"))))
    # the SAVED config carries the CLI overrides, not the preset defaults
    assert saved.data.snippet_samples == 4000
    assert saved.data.batch_size == 8

    from cpc_tpu.eval.cli import main as eval_main
    import io, contextlib
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = eval_main([f"--workdir={wd}", "--probe=speaker",
                        "--max-snippets=24", "--steps=20"])
    assert rc == 0
    res = json.loads(out.getvalue().strip().splitlines()[-1])
    assert "speaker_probe" in res

    # --battery runs the full study protocol (cpc_tpu.eval.battery) and
    # prints one row with every readout x split column
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = eval_main([f"--workdir={wd}", "--battery", "--probe-seeds=1"])
    assert rc == 0
    row = json.loads(out.getvalue().strip().splitlines()[-1])
    for col in ("speaker_file_acc", "speaker_file_last_acc",
                "speaker_file_max_acc", "speaker_utt_acc", "speaker_acc",
                "phone_file_acc", "phone_snip_acc"):
        assert col in row, col


def test_train_cli_distributed_flags(tmp_path, monkeypatch):
    """--coordinator/--distributed wire into multihost.initialize BEFORE the
    Trainer builds its mesh; bad flag combinations are rejected. The real
    2-process behavior is covered end-to-end in test_multihost.py — here we
    verify the CLI plumbing without a second process."""
    import pytest
    from cpc_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost, "initialize",
                        lambda *a: calls.append(a))
    wd = str(tmp_path / "run")
    rc = train_main([
        "--config=baseline", "--data=synthetic", f"--workdir={wd}",
        "--steps=1", "--batch-size=8", "--snippet-samples=4000",
        "--coordinator=127.0.0.1:1234", "--num-processes=1",
        "--process-id=0",
    ])
    assert rc == 0
    assert calls == [("127.0.0.1:1234", 1, 0)]

    with pytest.raises(SystemExit):
        train_main(["--coordinator=127.0.0.1:1234"])  # missing nprocs/pid


def test_apply_overrides_types_and_errors():
    """--set coercion: every leaf type, tuples, Optional-none, and loud
    failures on unknown paths / bad values."""
    import dataclasses

    import pytest

    from cpc_tpu.config import apply_overrides, presets

    cfg = presets.baseline()
    got = apply_overrides(cfg, [
        "model.ar.attn_impl=flash16",          # str
        "model.ar.num_layers=3",               # int
        "train.learning_rate=3e-4",            # float
        "data.augment=true",                   # bool
        "model.encoder.channels=64,64,128",    # tuple[int]
    ])
    assert got.model.ar.attn_impl == "flash16"
    assert got.model.ar.num_layers == 3
    assert got.train.learning_rate == 3e-4
    assert got.data.augment is True
    assert got.model.encoder.channels == (64, 64, 128)
    assert cfg.model.ar.num_layers != 3  # original untouched (frozen tree)

    opt = apply_overrides(cfg, ["data.snippet_stride=1024"])  # Optional[int]
    assert opt.data.snippet_stride == 1024
    assert apply_overrides(opt, ["data.snippet_stride=none"]
                           ).data.snippet_stride is None

    for bad, msg in [
        ("model.ar.nope=1", "no field"),
        ("model.nope.d_ar=1", "no field"),
        ("model.ar.num_layers.x=1", "leaf field"),
        ("model.ar.num_layers=abc", "invalid literal"),
        ("data.augment=maybe", "not a bool"),
        ("justnovalue", "dotted.path=value"),
    ]:
        with pytest.raises(ValueError, match=msg):
            apply_overrides(cfg, [bad])


def test_train_cli_set_overrides(tmp_path):
    """--set reaches fields no dedicated flag covers and persists them."""
    wd = str(tmp_path / "runset")
    rc = train_main([
        "--config=baseline", "--data=synthetic", f"--workdir={wd}",
        "--steps=2", "--batch-size=8", "--snippet-samples=4000",
        "--set", "model.loss.prediction_steps=5",
        "--set", "train.log_every=1",
    ])
    assert rc == 0
    saved = json.load(open(os.path.join(wd, "config.json")))
    assert saved["model"]["loss"]["prediction_steps"] == 5
    lines = [json.loads(l) for l in
             open(os.path.join(wd, "metrics.jsonl"))]
    assert len(lines[-1]["acc"]) == 5  # K actually changed the run
