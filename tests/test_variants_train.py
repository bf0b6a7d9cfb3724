"""Variant training integration (BASELINE.json:8-9): the scalogram front-end
and the causal-transformer gar must TRAIN (loss decreases on a memorizable
set), not just run forward."""

import json

import pytest

from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig, EncoderConfig,
                            LossConfig, ModelConfig, TrainConfig)
from cpc_tpu.data.dataset import SnippetDataset
from cpc_tpu.data.synthetic import generate_synthetic_corpus
from cpc_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def music_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("music"))
    generate_synthetic_corpus(root, style="music", num_speakers=4,
                              files_per_speaker=2, seconds_per_file=2.0,
                              seed=21)
    return root


@pytest.fixture(scope="module")
def speech_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("speech"))
    generate_synthetic_corpus(root, num_speakers=4, files_per_speaker=2,
                              seconds_per_file=2.0, seed=22)
    return root


def _losses(workdir):
    with open(f"{workdir}/metrics.jsonl") as f:
        return [json.loads(l)["loss"] for l in f
                if json.loads(l)["prefix"] == "train"]


def test_scalogram_variant_trains(music_corpus, tmp_path):
    cfg = CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(
                kind="scalogram", d_enc=32, scalogram_scale="log",
                scalogram_n_fft=256, scalogram_hop=160, scalogram_n_bins=32,
                scalogram_channels=(8, 16), scalogram_kernels=((3, 3), (3, 3)),
                scalogram_freq_strides=(2, 2), scalogram_time_strides=(1, 1)),
            ar=ArConfig(d_ar=16),
            loss=LossConfig(prediction_steps=3),
        ),
        data=DataConfig(batch_size=8, snippet_samples=4800, prefetch=1,
                        num_workers=2),
        train=TrainConfig(num_steps=25, log_every=5, eval_every=10**9,
                          checkpoint_every=10**9, learning_rate=2e-3),
    )
    ds = SnippetDataset(music_corpus, cfg.data.snippet_samples)
    tr = Trainer(cfg, ds, workdir=str(tmp_path / "scalo"))
    tr.train()
    tr.close()
    losses = _losses(tmp_path / "scalo")
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("attn_impl", ["xla", "flash", "flash16"])
def test_transformer_variant_trains(speech_corpus, tmp_path, attn_impl):
    cfg = CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                                  strides=(5, 4), d_enc=16),
            ar=ArConfig(kind="transformer", d_ar=16, num_layers=1,
                        num_heads=2, attn_impl=attn_impl),
            loss=LossConfig(prediction_steps=3),
        ),
        data=DataConfig(batch_size=8, snippet_samples=3000, prefetch=1),
        train=TrainConfig(num_steps=25, log_every=5, eval_every=10**9,
                          checkpoint_every=10**9, learning_rate=1e-3),
    )
    ds = SnippetDataset(speech_corpus, cfg.data.snippet_samples)
    tr = Trainer(cfg, ds, workdir=str(tmp_path / "xfmr"))
    tr.train()
    tr.close()
    losses = _losses(tmp_path / "xfmr")
    assert losses[-1] < losses[0], losses


def test_transformer_preset_recipe_baked_in(speech_corpus, tmp_path):
    """The transformer_gar preset must train WITHOUT the user supplying any
    recipe flags (VERDICT r4 next #6): run 6 measured that this family
    flatlines at the 1/pool accuracy floor with grad-norm spikes to 12+
    unless LR warmup + grad clipping are on (docs/DESIGN.md "transformer
    gar needs warmup + clipping"), so the preset now carries them. This
    test (a) pins the recipe into both transformer presets, (b) trains the
    transformer_gar preset as-is — model and train recipe untouched, only
    corpus/step-count shrunk for CPU — and requires the loss to move off
    its start while warmup is still ramping."""
    import dataclasses

    from cpc_tpu.config import presets

    for name in ("transformer_gar", "transformer_fast"):
        cfg = presets.by_name(name)
        assert cfg.train.warmup_steps > 0, name
        assert cfg.train.grad_clip_norm > 0, name

    cfg = presets.transformer_gar()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, batch_size=8,
                                 snippet_samples=4800, prefetch=1),
        train=dataclasses.replace(cfg.train, num_steps=60, log_every=10,
                                  eval_every=10**9, checkpoint_every=10**9),
    )
    ds = SnippetDataset(speech_corpus, cfg.data.snippet_samples)
    tr = Trainer(cfg, ds, workdir=str(tmp_path / "preset"))
    tr.train()
    tr.close()
    losses = _losses(tmp_path / "preset")
    assert losses[-1] < losses[0], losses
