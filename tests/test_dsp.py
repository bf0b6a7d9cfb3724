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


def _cqt_response(f_tone, n_bins, fmin, fmax, sr=16000, T=8000, hop=2000):
    """Mean linear power per bin for a unit tone at f_tone."""
    from cpc_tpu.ops.scalogram import cqt
    t = np.arange(T) / sr
    x = jnp.asarray(np.sin(2 * np.pi * f_tone * t)[None], jnp.float32)
    out = np.asarray(cqt(x, hop=hop, n_bins=n_bins, fmin=fmin, fmax=fmax,
                         sample_rate=sr))
    return np.exp(out[0]).mean(axis=0) - 1e-5  # undo log(p + eps)


def test_cqt_tone_peak_and_amplitude():
    """A tone at bin k's design center must peak AT bin k, with ~unit
    linear magnitude (the 2/sum(w) kernel normalization)."""
    from cpc_tpu.ops.scalogram import cqt_design
    n_bins, fmin, fmax = 48, 65.4, 4000.0
    f, lens, Q, b = cqt_design(n_bins, fmin, fmax, 16000)
    for k in (8, 24, 40):
        p = _cqt_response(f[k], n_bins, fmin, fmax)
        assert p.argmax() == k, (k, p.argmax())
        # power ~ (amplitude 1.0)^2 within windowing slop
        assert 0.5 < p[k] < 2.0, p[k]


def test_cqt_constant_q_across_bins():
    """THE constant-Q property (VERDICT r2 missing #4): the half-power
    bandwidth of each bin scales with its center frequency, i.e. measured
    Q = f_k / BW_3dB is ~the same for bins three octaves apart — which is
    exactly what the fixed-window STFT path cannot do."""
    from cpc_tpu.ops.scalogram import cqt_design
    n_bins, fmin, fmax = 48, 65.4, 4000.0
    f, lens, Q, b = cqt_design(n_bins, fmin, fmax, 16000)
    qs = []
    for k in (8, 24, 40):
        # sweep tone frequency +/-1.5 bin spacings around the center
        grid = np.linspace(-1.5, 1.5, 13)
        resp = np.array([_cqt_response(f[k] * 2.0 ** (g / b), n_bins,
                                       fmin, fmax)[k] for g in grid])
        half = resp.max() / 2.0
        above = np.where(resp >= half)[0]
        # linear interpolation at both half-power crossings, in bin units
        lo_i, hi_i = above[0], above[-1]
        assert lo_i > 0 and hi_i < len(grid) - 1, "sweep too narrow"
        def cross(i0, i1):
            g0, g1, r0, r1 = grid[i0], grid[i1], resp[i0], resp[i1]
            return g0 + (half - r0) * (g1 - g0) / (r1 - r0)
        g_lo = cross(lo_i - 1, lo_i)
        g_hi = cross(hi_i, hi_i + 1)
        bw = f[k] * (2.0 ** (g_hi / b) - 2.0 ** (g_lo / b))
        qs.append(f[k] / bw)
    qs = np.asarray(qs)
    # constant across three octaves within 20%, and in the design Q's range
    assert qs.max() / qs.min() < 1.2, qs
    assert 0.5 * Q < qs.mean() < 2.0 * Q, (qs, Q)


def test_cqt_kernel_lengths_scale_geometrically():
    """Per-bin analysis windows shrink geometrically with frequency (the
    defining difference from a fixed-n_fft STFT) and respect max_kernel."""
    from cpc_tpu.ops.scalogram import cqt_design
    f, lens, Q, b = cqt_design(128, 32.7, 8000.0, 16000, max_kernel=4096)
    assert lens[0] == 4096  # lowest bins truncated by the cap
    untrunc = lens < 4096
    ratio = (lens[untrunc] * f[untrunc]) / 16000.0  # should all be ~Q
    np.testing.assert_allclose(ratio, Q, rtol=0.02)
    assert lens[-1] < lens[untrunc][0] / 16  # >4 octaves of shrinkage


def test_scalogram_cqt_dispatch_shape():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8000)).astype(np.float32))
    s = scalogram(x, hop=500, n_bins=48, fmin=65.4, fmax=4000.0,
                  scale="cqt", sample_rate=16000)
    assert s.shape == (2, 16, 48)
    assert np.isfinite(np.asarray(s)).all()
