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


# ---- round-2 branch-coverage matrix (VERDICT r1 #3): LPC, RICE2,
# partitions, escapes, wasted bits, right/side, every FIXED order --------

def _roundtrip_exact(tmp_path, name, sig, **kw):
    """Integer-exact round trip: FLAC is lossless, so the decoded PCM must
    equal the quantized input bit for bit."""
    bps = kw.get("bits_per_sample", 16)
    p = str(tmp_path / f"{name}.flac")
    write_flac(p, sig, 16_000, **kw)
    y, sr = read_flac(p)
    assert sr == 16_000
    ref = sig if sig.ndim == 2 else sig[:, None]
    scale = (1 << (bps - 1)) - 1
    # identical float32 arithmetic to write_flac's quantizer
    want = np.clip(np.round(ref.astype(np.float32) * scale),
                   -scale - 1, scale).astype(np.int64)
    got = np.round(y.astype(np.float64) * (1 << (bps - 1))).astype(np.int64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("subframe", ["fixed3", "fixed4", "lpc1", "lpc2",
                                      "lpc8", "lpc12"])
def test_fixed_hi_and_lpc_subframes(tmp_path, subframe):
    _roundtrip_exact(tmp_path, subframe, _sig(n=6000), subframe=subframe)


@pytest.mark.parametrize("method", ["rice", "rice2"])
@pytest.mark.parametrize("porder", [0, 2, 4])
def test_residual_methods_and_partitions(tmp_path, method, porder):
    _roundtrip_exact(tmp_path, f"{method}_{porder}", _sig(n=8192),
                     subframe="lpc4", residual_method=method,
                     partition_order=porder, block_size=4096)


def test_escape_partitions(tmp_path):
    _roundtrip_exact(tmp_path, "escape", _sig(n=4096), subframe="fixed2",
                     partition_order=3, escape_partitions=True,
                     residual_method="rice2", block_size=4096)


def test_wasted_bits(tmp_path):
    # samples with 4 guaranteed trailing zero bits exercise the wasted-bits
    # subframe header and the post-reconstruction shift
    rng = np.random.default_rng(3)
    pcm = (rng.integers(-1800, 1800, size=5000) << 4).astype(np.int64)
    sig = (pcm / 32767.0).astype(np.float32)
    _roundtrip_exact(tmp_path, "wasted", sig, subframe="lpc4",
                     wasted_bits=True)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
@pytest.mark.parametrize("subframe", ["fixed2", "lpc4"])
def test_stereo_decorrelation_matrix(tmp_path, mode, subframe):
    _roundtrip_exact(tmp_path, f"{mode}_{subframe}", _sig(n=5000, ch=2),
                     stereo_mode=mode, subframe=subframe)


@pytest.mark.parametrize("bps", [8, 16, 24])
@pytest.mark.parametrize("mode", ["left_side", "mid_side"])
def test_stereo_bit_depth_matrix(tmp_path, bps, mode):
    _roundtrip_exact(tmp_path, f"{mode}_{bps}", _sig(n=3000, ch=2),
                     bits_per_sample=bps, stereo_mode=mode, subframe="lpc2",
                     residual_method="rice2", partition_order=1,
                     block_size=1024)


def test_lpc_compresses_tonal_audio(tmp_path):
    # sanity: LPC on a near-tonal signal should beat VERBATIM by a wide
    # margin (the residual entropy collapses once the predictor locks on)
    import os
    t = np.arange(16384) / 16_000
    rng = np.random.default_rng(0)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.002 * rng.standard_normal(16384)).astype(np.float32)
    pv = str(tmp_path / "v.flac"); write_flac(pv, sig, 16_000, subframe="verbatim")
    pl = str(tmp_path / "l.flac"); write_flac(pl, sig, 16_000, subframe="lpc8")
    assert os.path.getsize(pl) < 0.7 * os.path.getsize(pv)


def test_partial_tail_block_with_partitions(tmp_path):
    # the final partial block must lower its residual partition order
    # instead of erroring (real encoders do the same)
    _roundtrip_exact(tmp_path, "tailpart", _sig(n=4097), subframe="fixed2",
                     partition_order=2, block_size=4096)


def test_so_path_read_only_package_dir(monkeypatch, tmp_path):
    """pip-installed site-packages can be read-only: the .so build target
    must fall back to a user cache dir keyed by source mtime."""
    import cpc_tpu.data.flac as flacmod
    monkeypatch.setattr(flacmod.os, "access", lambda p, m: False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    so = flacmod._so_path()
    assert so.startswith(str(tmp_path))
    assert so.endswith(".so") and "cpc_tpu" in so


def test_corrupt_input_never_crashes(tmp_path):
    """Corrupt FLAC must raise (or decode garbage) — never abort the
    process. Fuzz-found: a corrupt STREAMINFO total_samples (36-bit, up to
    64G frames) made the unchecked pcm.reserve throw std::bad_alloc through
    the C ABI, terminating the interpreter."""
    import numpy as np
    from cpc_tpu.data.flac import read_flac
    from cpc_tpu.data.flac_encoder import write_flac

    rng = np.random.default_rng(7)
    x = (rng.standard_normal(4000) * 8000).astype(np.int16)
    good = tmp_path / "good.flac"
    write_flac(str(good), x[:, None], 16000)
    data = bytearray(good.read_bytes())

    # the deterministic bad_alloc reproducer: max out STREAMINFO total
    huge = bytearray(data)
    huge[21] |= 0x0F
    huge[22:26] = b"\xff\xff\xff\xff"
    p = tmp_path / "bad.flac"
    p.write_bytes(bytes(huge))
    try:
        read_flac(str(p))  # decoding to EOF is fine; aborting is the bug
    except Exception:
        pass

    for trial in range(200):
        buf = bytearray(data)
        mode = trial % 4
        if mode == 0:
            buf = buf[:rng.integers(4, len(buf))]
        elif mode == 1:
            for _ in range(rng.integers(1, 16)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        elif mode == 2:
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(0, min(64, len(buf)))] = rng.integers(0, 256)
        else:
            buf = bytearray(b"fLaC") + bytes(
                rng.integers(0, 256, rng.integers(10, 2000), dtype=np.uint8))
        p.write_bytes(bytes(buf))
        try:
            read_flac(str(p))
        except Exception:
            pass  # clean Python error is the contract
