"""Data layer tests: WAV round-trip, snippet index arithmetic (SURVEY.md
§4.4 contract), loader determinism and resume."""

import os
import numpy as np
import pytest

from cpc_tpu.data.dataset import ProbeDataset, SnippetDataset
from cpc_tpu.data.loader import Batcher
from cpc_tpu.data.synthetic import generate_synthetic_corpus
from cpc_tpu.data.wavio import read_wav, write_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    generate_synthetic_corpus(str(root), num_speakers=3, files_per_speaker=2,
                              seconds_per_file=2.0, seed=1)
    return str(root)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(5000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape == (5000, 1)
    # write scales by 32767, read by 32768: one-LSB quantization + scale skew
    np.testing.assert_allclose(y[:, 0], x, atol=2.0 / 32768)


def test_wav_stereo_and_24bit(tmp_path):
    import struct
    # hand-build a 24-bit stereo file
    sr, n = 8000, 100
    vals = np.linspace(-0.5, 0.5, n)
    pcm24 = np.round(vals * (1 << 23)).astype(np.int32)
    frames = b""
    for v in pcm24:
        b3 = int(v) & 0xFFFFFF
        frames += struct.pack("<I", b3)[:3] * 2  # same value both channels
    with open(tmp_path / "s24.wav", "wb") as f:
        data = frames
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 6, 6, 24))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    y, sr2 = read_wav(str(tmp_path / "s24.wav"))
    assert sr2 == sr and y.shape == (n, 2)
    np.testing.assert_allclose(y[:, 0], vals, atol=2e-7)


def test_snippet_index_arithmetic(corpus):
    ds = SnippetDataset(corpus, snippet_samples=16000, snippet_stride=8000)
    # each file is 2 s @16k = 32000 samples -> 1 + (32000-16000)//8000 = 3
    assert len(ds) == 6 * 3
    x = ds[0]
    assert x.shape == (16000,) and x.dtype == np.float32
    # adjacent snippets within a file overlap by stride
    a, b = ds[0], ds[1]
    np.testing.assert_array_equal(a[8000:], b[:8000])


def test_snippet_index_determinism(corpus):
    d1 = SnippetDataset(corpus, snippet_samples=20480)
    d2 = SnippetDataset(corpus, snippet_samples=20480)
    assert d1.files == d2.files
    np.testing.assert_array_equal(d1[3], d2[3])


def test_probe_dataset_labels(corpus):
    ds = ProbeDataset(corpus, snippet_samples=16000)
    assert ds.num_speakers == 3
    x, spk, phones = ds.item_with_labels(0)
    assert 0 <= spk < 3
    assert phones is not None and phones.shape == (16000,)


def test_batcher_determinism_and_resume(corpus):
    ds = SnippetDataset(corpus, snippet_samples=16000, snippet_stride=8000)
    b1 = Batcher(ds, batch_size=4, seed=7)
    got1 = []
    it = iter(b1)
    for _ in range(7):
        got1.append(next(it))
    state = b1.state()

    # fresh batcher restored mid-stream must continue identically
    b2 = Batcher(ds, batch_size=4, seed=0)
    b2.restore(state)
    n1 = next(iter(b2))
    b3 = Batcher(ds, batch_size=4, seed=7)
    it3 = iter(b3)
    for _ in range(7):
        next(it3)
    n3 = next(it3)
    assert n1[0] == n3[0] and n1[1] == n3[1]
    np.testing.assert_array_equal(n1[2], n3[2])

    # int16 wire format
    assert got1[0][2].dtype == np.int16


def test_batcher_epoch_rollover(corpus):
    ds = SnippetDataset(corpus, snippet_samples=16000, snippet_stride=8000)
    b = Batcher(ds, batch_size=4, seed=0)  # 18 snippets -> 4 batches/epoch
    seen = []
    it = iter(b)
    for _ in range(9):
        epoch, pos, _ = next(it)
        seen.append((epoch, pos))
    assert seen[:4] == [(0, 0), (0, 1), (0, 2), (0, 3)]
    assert seen[4] == (1, 0)


def test_dataset_resamples_mismatched_rate(tmp_path):
    # a 8 kHz file in a 16 kHz dataset: index lengths and content are in
    # target-rate samples (decode-time windowed-sinc resample)
    from cpc_tpu.data.wavio import write_wav
    from cpc_tpu.data.dataset import SnippetDataset
    sr_in, f = 8000, 440.0
    t = np.arange(sr_in * 2) / sr_in  # 2 seconds
    d = tmp_path / "spk" / "0"
    d.mkdir(parents=True)
    write_wav(str(d / "u.wav"), 0.5 * np.sin(2 * np.pi * f * t), sr_in)
    ds = SnippetDataset(str(tmp_path), snippet_samples=16000,
                        sample_rate=16000)
    assert len(ds) == 2  # 2 seconds at the TARGET rate
    snip = ds[0]
    t16 = np.arange(16000) / 16000
    ref = 0.5 * np.sin(2 * np.pi * f * t16)
    err = np.abs(snip[500:-500] - ref[500:-500]).max()
    assert err < 0.02, err


def test_batcher_keep_remainder(corpus):
    # drop_remainder=False pads nothing: the tail batch is smaller
    ds = SnippetDataset(corpus, snippet_samples=16000, snippet_stride=8000)
    # 18 snippets, batch 4 -> 4 full + 1 tail of 2
    b = Batcher(ds, batch_size=4, seed=0, drop_remainder=False)
    assert b.batches_per_epoch() == 5
    it = iter(b)
    sizes = [next(it)[2].shape[0] for _ in range(5)]
    assert sizes == [4, 4, 4, 4, 2]


def test_file_exactly_snippet_length(tmp_path):
    from cpc_tpu.data.wavio import write_wav
    d = tmp_path / "s" / "0"
    d.mkdir(parents=True)
    write_wav(str(d / "u.wav"), np.zeros(16000, np.float32), 16000)
    ds = SnippetDataset(str(tmp_path), snippet_samples=16000)
    assert len(ds) == 1
    assert ds[0].shape == (16000,)


def test_empty_corpus_raises(tmp_path):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no usable audio"):
        SnippetDataset(str(tmp_path), snippet_samples=16000)


def test_metrics_writer_tensorboard(tmp_path):
    # CLU/TB event files are written alongside the JSONL
    import os
    from cpc_tpu.train.metrics import MetricWriter
    w = MetricWriter(str(tmp_path), use_tensorboard=True, echo=False)
    w.write(1, {"loss": 1.5, "acc": np.array([0.1, 0.2])})
    w.close()
    assert os.path.exists(tmp_path / "metrics.jsonl")
    tb = tmp_path / "tb"
    assert tb.is_dir() and any(tb.iterdir())


def test_wav_info_matches_decode(corpus):
    from cpc_tpu.data.dataset import list_audio_files
    from cpc_tpu.data.wavio import wav_info
    for p in list_audio_files(corpus)[:3]:
        n, sr = wav_info(p)
        y, sr2 = read_wav(p)
        assert (n, sr) == (len(y), sr2)


def test_init_zero_decodes(tmp_path, monkeypatch):
    """Dataset init must learn lengths from headers, not full decodes
    (VERDICT r1 #5: a LibriSpeech-scale corpus would take minutes)."""
    import cpc_tpu.data.dataset as dsmod
    root = tmp_path / "many"
    rng = np.random.default_rng(0)
    for i in range(300):  # > cache size, so decode-based init would thrash
        d = root / f"spk{i % 5}"
        d.mkdir(parents=True, exist_ok=True)
        write_wav(str(d / f"f{i}.wav"), rng.standard_normal(2500) * 0.1, 16000)
    calls = []
    real = dsmod.decode
    monkeypatch.setattr(dsmod, "decode", lambda p: calls.append(p) or real(p))
    ds = SnippetDataset(str(root), snippet_samples=2000)
    assert calls == []
    assert len(ds) == 300
    _ = ds[0]  # getitem still decodes
    assert len(calls) == 1


def test_init_resampled_lengths_match_decode(tmp_path):
    """Header-based counts must agree with decoded lengths when the native
    rate differs from the target rate (resample out_len arithmetic)."""
    rng = np.random.default_rng(1)
    write_wav(str(tmp_path / "a.wav"), rng.standard_normal(22050) * 0.1, 22050)
    ds = SnippetDataset(str(tmp_path), snippet_samples=4000, sample_rate=16000)
    n_header = ds._file_snippets[0]
    decoded = ds._cache.get(ds.files[0])
    n_decode = 1 + (len(decoded) - 4000) // 4000
    assert n_header == n_decode


def test_extensible_wav_subformat(tmp_path):
    import struct
    sr, n = 8000, 64
    x = np.linspace(-0.5, 0.5, n).astype(np.float32)

    def write_ext(path, sub, payload, bits):
        guid = struct.pack("<H", sub) + b"\x00\x00" + \
            b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * bits // 8,
                          bits // 8, bits) + struct.pack("<HHI", 22, bits, 4) + guid
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 12 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
            f.write(b"data" + struct.pack("<I", len(payload)) + payload)

    pcm = np.round(x * 32767).astype("<i2").tobytes()
    write_ext(tmp_path / "pcm.wav", 1, pcm, 16)
    y, _ = read_wav(str(tmp_path / "pcm.wav"))
    np.testing.assert_allclose(y[:, 0], x, atol=2e-4)

    flt = x.astype("<f4").tobytes()
    write_ext(tmp_path / "f32.wav", 3, flt, 32)
    y, _ = read_wav(str(tmp_path / "f32.wav"))
    np.testing.assert_allclose(y[:, 0], x, atol=1e-7)  # not garbage-as-int

    write_ext(tmp_path / "alaw.wav", 6, pcm, 16)
    with pytest.raises(ValueError, match="SubFormat"):
        read_wav(str(tmp_path / "alaw.wav"))


def test_cache_type_budgets_independent(corpus):
    """Interleaved float/int16 access must not cross-evict (ADVICE r1)."""
    from cpc_tpu.data.dataset import _DecodedCache
    from cpc_tpu.data.dataset import list_audio_files
    files = list_audio_files(corpus)
    cache = _DecodedCache(16000, max_items=2)
    a, b = files[0], files[1]
    cache.get_int16(a)
    assert a in cache._i16
    for p in files[:4]:
        cache.get(p)  # churn the float LRU well past its budget
    assert a in cache._i16  # int16 entry survived float evictions
    assert len(cache._float) <= 2


def test_dynamics_corpus_hides_speaker_in_transitions(tmp_path):
    """The 'dynamics' style (probe-study hard mode): every speaker's phone
    chain has a uniform stationary distribution (doubly stochastic
    transitions), so pooled phone statistics carry no speaker identity —
    only the transition structure does, and it must differ per speaker."""
    from cpc_tpu.data.synthetic import (NUM_PHONES, generate_synthetic_corpus,
                                        speaker_transition_matrices)

    root = tmp_path / "dyn"
    paths = generate_synthetic_corpus(
        str(root), style="dynamics", num_speakers=4, files_per_speaker=2,
        seconds_per_file=20.0, seed=7)
    assert len(paths) == 8

    emp = []
    for spk in range(4):
        prefix = str(root / str(spk)) + os.sep
        labels = np.concatenate([
            np.load(p.replace(".wav", ".phones.npy"))
            for p in paths if p.startswith(prefix)])
        # uniform stationary distribution: each phone ~1/P of samples.
        # The chain mixes slowly (alpha=0.75), so a 40 s sample has ~0.05
        # std per bin — this is a sanity bound; the exact property is the
        # doubly-stochastic row/column sums asserted below.
        hist = np.bincount(labels, minlength=NUM_PHONES) / len(labels)
        np.testing.assert_allclose(hist, 1 / NUM_PHONES, atol=0.15)
        # empirical transition matrix (segment-level)
        segs = labels[np.flatnonzero(np.diff(labels) != 0)]
        nxt = labels[np.flatnonzero(np.diff(labels) != 0) + 1]
        T = np.zeros((NUM_PHONES, NUM_PHONES))
        for a, b in zip(segs, nxt):
            T[a, b] += 1
        T /= np.maximum(T.sum(1, keepdims=True), 1)
        emp.append(T)
    # per-speaker dominant next-phone maps are permutations, all distinct
    perms = [tuple(np.argmax(T, axis=1)) for T in emp]
    for p in perms:
        assert sorted(p) == list(range(NUM_PHONES)), p
    assert len(set(perms)) == 4

    # the matrix builder itself is doubly stochastic
    mats = speaker_transition_matrices(6, np.random.default_rng(0))
    np.testing.assert_allclose(mats.sum(1), 1.0, atol=1e-9)
    np.testing.assert_allclose(mats.sum(2), 1.0, atol=1e-9)


def test_probe_labels_remap_on_resample(tmp_path):
    """.phones.npy is per-NATIVE-sample; a corpus at a different rate must
    have its label indexing remapped exactly like pack_corpus does —
    otherwise the phone probe silently trains on misaligned labels."""
    from cpc_tpu.data.dataset import ProbeDataset
    from cpc_tpu.data.wavio import write_wav

    root = tmp_path / "c32k"
    (root / "spk0").mkdir(parents=True)
    sr_native, sr_target = 32_000, 16_000
    n = sr_native * 2
    rng = np.random.default_rng(0)
    wav = (root / "spk0" / "utt0.wav")
    write_wav(str(wav), (rng.standard_normal(n) * 0.1).astype(np.float32),
              sr_native)
    # labels change every native 0.1 s — recognizable blocks
    lab = (np.arange(n) // (sr_native // 10)).astype(np.uint8)
    np.save(str(wav)[:-4] + ".phones.npy", lab)

    snippet = 8_000  # target-rate samples
    ds = ProbeDataset(str(root), snippet_samples=snippet,
                      sample_rate=sr_target)
    x, spk, phones = ds.item_with_labels(1)  # second snippet: offset 8000
    assert phones is not None and len(phones) == snippet
    off = snippet  # target-rate offset of snippet index 1
    src = (np.arange(off, off + snippet) * sr_native) // sr_target
    np.testing.assert_array_equal(phones, lab[src])

    # a PARTIAL alignment (shorter than the audio) must yield None (skip),
    # never a ragged array that crashes np.stack downstream
    np.save(str(wav)[:-4] + ".phones.npy", lab[: n // 2])
    ds2 = ProbeDataset(str(root), snippet_samples=snippet,
                       sample_rate=sr_target)
    assert ds2.item_with_labels(3)[2] is None  # native window past labels
    assert ds2.item_with_labels(0)[2] is not None  # covered window still OK
