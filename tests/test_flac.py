"""Native FLAC decoder round-trip tests: the C++ decoder
(cpc_tpu/data/native/flacdec.cpp, built on demand via g++/ctypes) against the
in-repo pure-Python encoder, across subframe types, bit depths, and stereo
decorrelation modes."""

import numpy as np
import pytest

from cpc_tpu.data.flac import read_flac
from cpc_tpu.data.flac_encoder import write_flac


def _sig(n=10_000, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16_000
    base = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    if ch == 1:
        return base.astype(np.float32)
    other = 0.3 * np.sin(2 * np.pi * 660 * t) + 0.05 * rng.standard_normal(n)
    return np.stack([base, other], axis=1).astype(np.float32)


def _roundtrip(tmp_path, sig, atol, **kw):
    p = str(tmp_path / "t.flac")
    write_flac(p, sig, 16_000, **kw)
    y, sr = read_flac(p)
    assert sr == 16_000
    ref = sig if sig.ndim == 2 else sig[:, None]
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=atol)


@pytest.mark.parametrize("subframe", ["verbatim", "fixed0", "fixed1",
                                      "fixed2"])
def test_mono_subframe_types(tmp_path, subframe):
    _roundtrip(tmp_path, _sig(), atol=2 / 32768, subframe=subframe)


def test_constant_subframe(tmp_path):
    sig = np.full(8192, 0.25, np.float32)
    _roundtrip(tmp_path, sig, atol=2 / 32768, subframe="constant")


@pytest.mark.parametrize("mode", ["independent", "mid_side", "left_side"])
def test_stereo_modes(tmp_path, mode):
    _roundtrip(tmp_path, _sig(ch=2), atol=2 / 32768, stereo_mode=mode)


@pytest.mark.parametrize("bps,atol", [(8, 2 / 128), (16, 2 / 32768),
                                      (24, 2 / (1 << 23))])
def test_bit_depths(tmp_path, bps, atol):
    _roundtrip(tmp_path, _sig(n=5000), atol=atol, bits_per_sample=bps)


def test_odd_tail_block(tmp_path):
    # length not a multiple of the block size exercises the custom-blocksize
    # header path for the final frame
    _roundtrip(tmp_path, _sig(n=4096 + 1234), atol=2 / 32768)


def test_dataset_integration(tmp_path):
    # SnippetDataset discovers and decodes .flac via the native decoder
    from cpc_tpu.data.dataset import SnippetDataset
    d = tmp_path / "spk0" / "0"
    d.mkdir(parents=True)
    sig = _sig(n=32_000)
    write_flac(str(d / "utt0.flac"), sig, 16_000)
    ds = SnippetDataset(str(tmp_path), snippet_samples=16_000,
                        snippet_stride=8_000)
    assert len(ds) == 3
    np.testing.assert_allclose(ds[0], sig[:16_000], atol=2 / 32768)


def test_corrupt_file_raises(tmp_path):
    p = tmp_path / "bad.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 64)
    with pytest.raises(ValueError, match="FLAC decode failed"):
        read_flac(str(p))
