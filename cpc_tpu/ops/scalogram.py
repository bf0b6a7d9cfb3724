"""On-device scalogram (log-mel / CQT-like) front-end.

The reference computes CQT/mel scalograms on the host as torch preprocessing
(SURVEY.md §3 "Scalogram front-end"). TPU-native design (SURVEY.md §2 N0/N2,
BASELINE.json:8): the waveform goes to the device raw and the whole DSP chain
— framing, Hann window, rFFT, filterbank matmul, log compression — runs inside
the jitted step. Framing is a gather-free reshape/strided slice, the rFFT is
XLA's batched FFT, and the filterbank is one (n_freqs x n_bins) matmul.

Filterbanks are built in numpy at trace time (static shapes) and become XLA
constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def _filterbank(n_fft: int, n_bins: int, fmin: float, fmax: float,
                sample_rate: int, scale: str) -> np.ndarray:
    """Triangular filterbank (n_freqs, n_bins); centers mel- or log-spaced
    (log spacing == constant-Q-like geometric center frequencies)."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    if scale == "mel":
        centers = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax),
                                         n_bins + 2))
    elif scale == "log":
        centers = np.geomspace(fmin, fmax, n_bins + 2)
    else:
        raise ValueError(f"unknown scalogram scale {scale!r}")
    fb = np.zeros((n_freqs, n_bins), dtype=np.float32)
    for b in range(n_bins):
        lo, mid, hi = centers[b], centers[b + 1], centers[b + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - freqs) / max(hi - mid, 1e-9)
        fb[:, b] = np.maximum(0.0, np.minimum(up, down))
    # Slaney-style area normalization keeps response ~flat across bins.
    enorm = 2.0 / (centers[2:] - centers[:-2])
    fb *= enorm[None, :].astype(np.float32)
    return fb


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame_len); reflect-padded so n_frames == T//hop
    (keeps the one-latent-per-hop contract aligned with the conv path)."""
    B, T = x.shape
    n_frames = T // hop
    pad = frame_len // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    # centers at i*hop: slice [i*hop, i*hop + frame_len) in padded coords.
    idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(frame_len)[None, :]
    return xp[:, idx]  # (B, n_frames, frame_len)


def scalogram(
    x: jnp.ndarray,
    *,
    n_fft: int = 1024,
    hop: int = 160,
    n_bins: int = 128,
    fmin: float = 32.7,
    fmax: float = 8000.0,
    scale: str = "mel",
    sample_rate: int = 16_000,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Waveform (B, T) -> log-power scalogram (B, T//hop, n_bins), on device."""
    frames = frame_signal(x, n_fft, hop)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2  # (B, frames, n_freqs)
    fb = jnp.asarray(_filterbank(n_fft, n_bins, fmin, fmax, sample_rate, scale))
    banded = jnp.einsum("btf,fm->btm", power, fb)
    return jnp.log(banded + eps)
