"""Pre-decoded memmap corpus (SURVEY.md §8.4 input-pipeline mitigation):
pack-time decode equivalence with the live-decode SnippetDataset, zero
decodes at access time, Batcher/probe-label compatibility."""

import numpy as np
import pytest

import cpc_tpu.data.dataset as dsmod
from cpc_tpu.data.dataset import ProbeDataset, SnippetDataset
from cpc_tpu.data.loader import Batcher
from cpc_tpu.data.packed import PackedSnippetDataset, pack_corpus
from cpc_tpu.data.synthetic import generate_synthetic_corpus


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pk_corpus"))
    generate_synthetic_corpus(root, num_speakers=3, files_per_speaker=2,
                              seconds_per_file=2.0, seed=21)
    packed = str(tmp_path_factory.mktemp("pk_packed"))
    meta = pack_corpus(root, packed)
    return root, packed, meta


def test_pack_index_totals(corpora):
    root, packed, meta = corpora
    assert len(meta["files"]) == 6
    assert meta["total_samples"] == 6 * 32000
    assert meta["has_phones"]  # synthetic generator writes .phones.npy


def test_snippets_match_live_decode(corpora):
    root, packed, _ = corpora
    live = SnippetDataset(root, snippet_samples=16000, snippet_stride=8000)
    mm = PackedSnippetDataset(packed, snippet_samples=16000,
                              snippet_stride=8000)
    assert len(live) == len(mm)
    for i in (0, 1, len(live) // 2, len(live) - 1):
        np.testing.assert_array_equal(live.snippet_int16(i),
                                      mm.snippet_int16(i))
        np.testing.assert_allclose(live[i], mm[i], atol=1.0 / 32768)
        assert live.locate(i)[1] == mm.locate(i)[1]
        assert live.speaker_of(i) == mm.speaker_of(i)


def test_zero_decodes_at_access(corpora, monkeypatch):
    root, packed, _ = corpora
    calls = []
    monkeypatch.setattr(dsmod, "decode",
                        lambda p: calls.append(p) or (_ for _ in ()).throw(
                            AssertionError("decode called")))
    mm = PackedSnippetDataset(packed, snippet_samples=16000)
    _ = mm[0]
    _ = mm.snippet_int16(1)
    _ = mm.item_with_labels(0)
    assert calls == []


def test_probe_labels_match(corpora):
    root, packed, _ = corpora
    live = ProbeDataset(root, snippet_samples=16000)
    mm = PackedSnippetDataset(packed, snippet_samples=16000)
    assert mm.num_speakers == live.num_speakers == 3
    for i in range(len(live)):
        xl, sl, pl = live.item_with_labels(i)
        xm, sm, pm = mm.item_with_labels(i)
        assert sl == sm
        assert (pl is None) == (pm is None)
        if pl is not None:
            np.testing.assert_array_equal(pl[:16000], pm)


def test_batcher_over_packed(corpora):
    _, packed, _ = corpora
    mm = PackedSnippetDataset(packed, snippet_samples=16000,
                              snippet_stride=8000)
    b = Batcher(mm, 4, shuffle=True, seed=0, transfer_dtype="int16")
    _, _, batch = next(iter(b))
    assert batch.shape == (4, 16000) and batch.dtype == np.int16


def test_rate_mismatch_raises(corpora):
    _, packed, _ = corpora
    with pytest.raises(ValueError, match="re-pack"):
        PackedSnippetDataset(packed, snippet_samples=16000, sample_rate=8000)


def test_partial_phone_labels_excluded(tmp_path):
    """A snippet overlapping unlabeled audio (alignment shorter than the
    file) must come back phones=None, never leaking the 255 sentinel."""
    import os
    from cpc_tpu.data.wavio import write_wav
    root = tmp_path / "short_lab"
    d = root / "spk0" / "ch0"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(32000).astype(np.float32) * 0.1
    write_wav(str(d / "u.wav"), wav, 16000)
    np.save(str(d / "u.phones.npy"),
            np.ones(20000, np.uint8))  # alignment covers only 20k samples
    packed = str(tmp_path / "short_packed")
    pack_corpus(str(root), packed)
    mm = PackedSnippetDataset(packed, snippet_samples=16000,
                              snippet_stride=16000)
    x0, _, p0 = mm.item_with_labels(0)  # fully inside the labeled span
    x1, _, p1 = mm.item_with_labels(1)  # overlaps the unlabeled tail
    assert p0 is not None and p0.max() < 255
    assert p1 is None


def test_trainer_over_packed_end_to_end(corpora, tmp_path):
    """The production ingest path: Trainer fed by PackedSnippetDataset
    trains, checkpoints, and resumes exactly like the live-decode path."""
    from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig,
                                EncoderConfig, LossConfig, ModelConfig,
                                TrainConfig)
    from cpc_tpu.train.trainer import Trainer

    _, packed, _ = corpora
    cfg = CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                                  strides=(5, 4), d_enc=16),
            ar=ArConfig(d_ar=8),
            loss=LossConfig(prediction_steps=2),
        ),
        data=DataConfig(batch_size=8, snippet_samples=2000, prefetch=1),
        train=TrainConfig(num_steps=12, log_every=6, eval_every=10**9,
                          checkpoint_every=6),
    )
    ds = PackedSnippetDataset(packed, 2000)
    wd = str(tmp_path / "run")
    tr = Trainer(cfg, ds, workdir=wd)
    m = tr.train()
    tr.close()
    assert np.isfinite(float(m["loss"]))
    assert tr.step == 12

    # resume from the packed-corpus checkpoint continues exactly
    tr2 = Trainer(cfg, PackedSnippetDataset(packed, 2000), workdir=wd)
    assert tr2.maybe_resume()
    assert tr2.step == 12
    tr2.close()


def test_packed_composes_with_device_corpus(corpora):
    """--packed + --device-corpus: load_device_corpus is duck-typed over
    snippet_int16, so the memmap corpus uploads as the HBM-resident array
    and a train step runs on device-gathered batches."""
    import dataclasses

    from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig,
                                EncoderConfig, LossConfig, ModelConfig,
                                TrainConfig)
    import jax

    from cpc_tpu.data.loader import load_device_corpus
    from cpc_tpu.parallel.mesh import make_mesh
    from cpc_tpu.train.trainer import Trainer

    _, packed, _ = corpora
    ds = PackedSnippetDataset(packed, 2000)
    dev = load_device_corpus(ds)
    assert dev.shape == (len(ds), 2000) and str(dev.dtype) == "int16"
    np.testing.assert_array_equal(np.asarray(dev[3]), ds.snippet_int16(3))

    cfg = CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                                  strides=(5, 4), d_enc=16),
            ar=ArConfig(d_ar=8),
            loss=LossConfig(prediction_steps=2),
        ),
        data=DataConfig(batch_size=8, snippet_samples=2000, prefetch=1,
                        device_corpus=True),
        train=TrainConfig(num_steps=3, log_every=1000, eval_every=10**9,
                          checkpoint_every=10**9),
    )
    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    tr = Trainer(cfg, ds, workdir=None, mesh=mesh1)
    m = tr.train()
    tr.close()
    assert tr.step == 3 and np.isfinite(float(m["loss"]))
