"""On-device DSP tests (SURVEY.md §2 N0): dequantization, normalization,
rational resampling, scalogram framing."""

import jax.numpy as jnp
import numpy as np

from cpc_tpu.ops.dsp import dequantize, normalize_snippets, resample
from cpc_tpu.ops.scalogram import frame_signal, scalogram


def test_dequantize_int16():
    x = jnp.asarray([[-32768, 0, 16384, 32767]], jnp.int16)
    y = dequantize(x)
    np.testing.assert_allclose(np.asarray(y[0]),
                               [-1.0, 0.0, 0.5, 32767 / 32768], atol=1e-6)


def test_normalize_moments():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 4000)) * 7 + 3, jnp.float32)
    y = np.asarray(normalize_snippets(x))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-3)


import pytest


@pytest.mark.parametrize("sr_in,sr_out,f",
                         [(8000, 16000, 440.0),    # upsample
                          (48000, 16000, 440.0),   # downsample
                          (22050, 16000, 440.0)])  # non-integer ratio
def test_resample_preserves_tone(sr_in, sr_out, f):
    t_in = np.arange(sr_in) / sr_in
    x = jnp.asarray(np.sin(2 * np.pi * f * t_in)[None], jnp.float32)
    y = np.asarray(resample(x, sr_in, sr_out))[0]
    assert y.shape[0] == sr_out  # 1 second in, 1 second out
    t_out = np.arange(len(y)) / sr_out
    ref = np.sin(2 * np.pi * f * t_out)
    # ignore filter edges
    sl = slice(200, -200)
    err = np.abs(y[sl] - ref[sl]).max()
    assert err < 0.02, err


def test_resample_identity():
    x = jnp.ones((1, 100), jnp.float32)
    assert resample(x, 16000, 16000) is x


def test_frame_signal_alignment():
    x = jnp.asarray(np.arange(3200, dtype=np.float32)[None])
    frames = frame_signal(x, frame_len=400, hop=160)
    assert frames.shape == (1, 20, 400)
    # frame i is centered at i*hop (reflect padding of 200)
    np.testing.assert_allclose(np.asarray(frames[0, 5, 200]), 5 * 160.0)


def test_scalogram_tone_peak():
    # a 1 kHz tone should peak in the bin whose center is nearest 1 kHz
    sr = 16000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 1000.0 * t)[None], jnp.float32)
    s = np.asarray(scalogram(x, n_fft=512, hop=160, n_bins=64,
                             fmin=50.0, fmax=8000.0, scale="mel",
                             sample_rate=sr))
    mean_spec = s[0].mean(axis=0)
    peak = mean_spec.argmax()
    # mel centers for 64 bins between 50 and 8000: 1 kHz lands mid-scale
    assert 20 <= peak <= 45, peak
