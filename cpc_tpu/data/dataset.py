"""Snippet datasets: the deterministic flat (file, offset) index contract
(SURVEY.md §4.4) — it defines what an "epoch" and a "batch" mean for parity.

`SnippetDataset.__init__` walks the corpus dir, computes per-file snippet
counts from durations, and builds a flat index; `__getitem__(i)` returns the
i-th fixed-length waveform snippet as float32 numpy. Decode is host-side
(numpy WAV; native C++ FLAC via cpc_tpu.data.flac when built); resample /
normalization happen ON DEVICE (cpc_tpu.ops.dsp), not here.
"""

from __future__ import annotations

import bisect
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from cpc_tpu.data.wavio import read_wav, wav_info

_DECODERS: Dict[str, Callable[[str], Tuple[np.ndarray, int]]] = {
    ".wav": read_wav,
}

# Header-only (num_samples, native_rate) probes: O(1) per file, no sample
# decode. Optional — files without one fall back to a full decode.
_INFOS: Dict[str, Callable[[str], Tuple[int, int]]] = {
    ".wav": wav_info,
}


def register_decoder(ext: str, fn: Callable[[str], Tuple[np.ndarray, int]],
                     info_fn: Optional[Callable[[str], Tuple[int, int]]] = None):
    _DECODERS[ext.lower()] = fn
    if info_fn is not None:
        _INFOS[ext.lower()] = info_fn


def _try_register_flac():
    try:
        from cpc_tpu.data.flac import flac_info
        _INFOS.setdefault(".flac", flac_info)  # pure Python, always works
        from cpc_tpu.data.flac import read_flac  # needs the native lib
        _DECODERS.setdefault(".flac", read_flac)
    except Exception:
        pass


def list_audio_files(root: str, exts: Optional[Sequence[str]] = None) -> List[str]:
    _try_register_flac()
    exts = tuple(e.lower() for e in (exts or _DECODERS.keys()))
    out = []
    for dirpath, _, files in sorted(os.walk(root)):
        for fn in sorted(files):
            if os.path.splitext(fn)[1].lower() in exts:
                out.append(os.path.join(dirpath, fn))
    return out


def decode(path: str) -> Tuple[np.ndarray, int]:
    _try_register_flac()
    ext = os.path.splitext(path)[1].lower()
    if ext not in _DECODERS:
        raise ValueError(f"no decoder for {ext!r} ({path}); "
                         f"have {sorted(_DECODERS)}")
    return _DECODERS[ext](path)


def decode_mono(path: str, target_rate: int) -> Tuple[np.ndarray, int]:
    """(float32 mono waveform at target_rate, NATIVE rate) — THE definition
    of \"load this file\" shared by the decode cache, pack_corpus and the
    --extract CLI, so channel mixing / resampling has one place to fix."""
    audio, sr = decode(path)
    x = audio.mean(axis=1) if audio.shape[1] > 1 else audio[:, 0]
    x = np.ascontiguousarray(x, dtype=np.float32)
    if sr != target_rate:
        import jax.numpy as jnp

        from cpc_tpu.ops.dsp import resample
        x = np.asarray(resample(jnp.asarray(x[None]), sr, target_rate))[0]
    return x, sr


class _DecodedCache:
    """Tiny LRU of decoded mono float32 waveforms (host RAM). Files whose
    native rate differs from `sample_rate` are resampled once at decode time
    (windowed-sinc, same math as the on-device op in cpc_tpu.ops.dsp) so the
    snippet index is always in target-rate samples."""

    def __init__(self, sample_rate: int, max_items: int = 256):
        self.sample_rate = sample_rate
        self.max_items = max_items
        # Independent LRU budgets: interleaved float/int16 access must not
        # evict the other type's entries (each is its own working set).
        self._float: Dict[str, np.ndarray] = {}
        self._i16: Dict[str, np.ndarray] = {}

    def get(self, path: str) -> np.ndarray:
        x = self._float.pop(path, None)
        if x is None:
            x, _ = decode_mono(path, self.sample_rate)
        self._float[path] = x
        while len(self._float) > self.max_items:
            self._float.pop(next(iter(self._float)))
        return x

    def get_int16(self, path: str) -> np.ndarray:
        """int16 view of the decoded waveform, quantized ONCE per file (the
        per-batch float->int16 conversion was 60% of host assembly time)."""
        x = self._i16.pop(path, None)
        if x is None:
            f = self.get(path)
            x = np.clip(np.round(f * 32768.0), -32768, 32767).astype(np.int16)
        self._i16[path] = x
        while len(self._i16) > self.max_items:
            self._i16.pop(next(iter(self._i16)))
        return x


class FlatSnippetIndex:
    """The deterministic flat (file, offset) snippet-index arithmetic
    (SURVEY.md §4.4) shared by SnippetDataset and PackedSnippetDataset —
    one definition of what an 'epoch' and a 'batch' mean.

    Subclasses populate self.files / self._file_snippets and call
    _finalize_index(); snippet_samples and snippet_stride must be set."""

    @staticmethod
    def snippet_count(n_samples: int, snippet_samples: int,
                      stride: int) -> int:
        return 0 if n_samples < snippet_samples else (
            1 + (n_samples - snippet_samples) // stride)

    def _finalize_index(self, where: str) -> None:
        if not self.files:
            raise ValueError(f"no usable audio under {where!r} "
                             f"(need >= {self.snippet_samples} samples "
                             f"per file)")
        self._cum = np.cumsum([0] + self._file_snippets)

    def __len__(self) -> int:
        return int(self._cum[-1])

    def _locate_file(self, idx: int) -> Tuple[int, int]:
        """index -> (file number, sample offset within the file)."""
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        f = bisect.bisect_right(self._cum, idx) - 1
        return f, (idx - int(self._cum[f])) * self.snippet_stride

    def locate(self, idx: int) -> Tuple[str, int]:
        """index -> (file path, sample offset)."""
        f, off = self._locate_file(idx)
        return self.files[f], off


class SnippetDataset(FlatSnippetIndex):
    """Flat snippet index over a corpus directory.

    Mirrors the reference's AudioDataset contract (SURVEY.md §3, §4.4):
    fixed snippet length (visible window + prediction horizon), per-file
    snippet count 1 + (len - snippet) // stride, deterministic ordering.
    """

    def __init__(
        self,
        corpus_dir: str,
        snippet_samples: int = 20_480,
        snippet_stride: Optional[int] = None,
        sample_rate: int = 16_000,
        cache_items: int = 256,
    ):
        self.corpus_dir = corpus_dir
        self.snippet_samples = snippet_samples
        self.snippet_stride = snippet_stride or snippet_samples
        self.sample_rate = sample_rate
        self._cache = _DecodedCache(sample_rate, cache_items)

        self.files: List[str] = []
        self._file_snippets: List[int] = []
        for path in list_audio_files(corpus_dir):
            cnt = self.snippet_count(self._num_samples(path),
                                     snippet_samples, self.snippet_stride)
            if cnt > 0:
                self.files.append(path)
                self._file_snippets.append(cnt)
        self._finalize_index(corpus_dir)

    def _num_samples(self, path: str) -> int:
        """Target-rate sample count, from the file header when possible.

        WAV headers / FLAC STREAMINFO give (frames, native_rate) in O(1), so
        init over a LibriSpeech-scale corpus performs zero decodes; files
        whose format lacks a header probe (or whose STREAMINFO leaves the
        total unknown) fall back to a full decode through the cache."""
        info = _INFOS.get(os.path.splitext(path)[1].lower())
        if info is not None:
            try:
                n, sr = info(path)
            except (ValueError, OSError):
                n = 0
            if n > 0:
                if sr == self.sample_rate:
                    return n
                # same arithmetic as cpc_tpu.ops.dsp.resample's out_len
                g = int(np.gcd(sr, self.sample_rate))
                return (n * (self.sample_rate // g)) // (sr // g)
        return len(self._cache.get(path))

    def __getitem__(self, idx: int) -> np.ndarray:
        path, off = self.locate(idx)
        x = self._cache.get(path)
        return x[off:off + self.snippet_samples]

    def snippet_int16(self, idx: int) -> np.ndarray:
        """Snippet in the int16 wire format (quantized once per file)."""
        path, off = self.locate(idx)
        x = self._cache.get_int16(path)
        return x[off:off + self.snippet_samples]

    def speaker_of(self, idx: int) -> str:
        """Speaker id from the LibriSpeech-style path layout
        <root>/<speaker>/<chapter>/<utt> (used by the speaker probe)."""
        path, _ = self.locate(idx)
        rel = os.path.relpath(path, self.corpus_dir)
        return rel.split(os.sep)[0]


class ProbeDataset(SnippetDataset):
    """SnippetDataset that also yields labels for the downstream probes
    (SURVEY.md §4.3, BASELINE.json:11).

    Speaker labels come from the directory layout; phone labels from sibling
    `<utt>.phones.npy` per-sample label files when present (the synthetic
    generator writes them; for real corpora, point at a forced-alignment dump
    in the same format).
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        speakers = sorted({self.speaker_of(self._cum[i])
                           for i in range(len(self.files))})
        self.speaker_to_id = {s: i for i, s in enumerate(speakers)}
        self.num_speakers = len(speakers)

    def item_with_labels(self, idx: int):
        path, off = self.locate(idx)
        x = self._cache.get(path)[off:off + self.snippet_samples]
        spk = self.speaker_to_id[self.speaker_of(idx)]
        phones = None
        lab_path = os.path.splitext(path)[0] + ".phones.npy"
        if os.path.exists(lab_path):
            lab = np.load(lab_path)
            sr = self._native_rate(path)
            if sr == self.sample_rate:
                w = lab[off:off + self.snippet_samples]
                # partial/short alignment -> None: the probe SKIPS the
                # snippet (probes.py), it must not see ragged label arrays
                phones = w if len(w) == self.snippet_samples else None
            else:
                # .phones.npy is per-NATIVE-sample; off/snippet are
                # target-rate — nearest-sample remap, same arithmetic as
                # pack_corpus (packed.py)
                src = (np.arange(off, off + self.snippet_samples)
                       * sr) // self.sample_rate
                phones = lab[src] if src[-1] < len(lab) else None
        return x, spk, phones

    def _native_rate(self, path: str) -> int:
        rates = getattr(self, "_rates", None)
        if rates is None:
            rates = self._rates = {}
        sr = rates.get(path)
        if sr is None:
            probe = _INFOS.get(os.path.splitext(path)[1].lower())
            sr = 0
            if probe is not None:
                try:
                    _, sr = probe(path)
                except (ValueError, OSError):
                    sr = 0
            if not sr:
                sr = decode(path)[1]
            rates[path] = sr
        return sr
