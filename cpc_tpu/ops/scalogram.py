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


@functools.lru_cache(maxsize=8)
def _cqt_kernels(n_bins: int, fmin: float, fmax: float, sample_rate: int,
                 max_kernel: int):
    """Brown/Puckette-style constant-Q kernel bank, built in numpy at trace
    time. Returns (kernels (N_max, 2*n_bins) float32, N_max, Q,
    bins_per_octave): column 2k is bin k's real part, 2k+1 its imaginary.

    Per bin k: center f_k = fmin * 2^(k/b) with b bins/octave chosen so bin
    n_bins-1 lands on fmax; Q = 1/(2^(1/b)-1) (adjacent-bin half-power
    crossover); kernel = Hann(N_k) * exp(-2pi i f_k n / sr) * 2/sum(w),
    N_k = Q*sr/f_k, zero-padded centered in N_max. The 2/sum(w) scaling
    makes a unit-amplitude tone at f_k read ~1.0 in linear magnitude —
    log-power is then comparable across bins (the mel path's Slaney
    normalization plays the same role).

    Low bins needing N_k > max_kernel are truncated to max_kernel (their Q
    degrades gracefully instead of the frame blowing up); the mel/log STFT
    path has far worse low-bin resolution, so this is still a strict
    improvement (VERDICT r2 missing #4)."""
    octaves = np.log2(fmax / fmin)
    b = (n_bins - 1) / octaves  # bins per octave
    Q = 1.0 / (2.0 ** (1.0 / b) - 1.0)
    f = fmin * 2.0 ** (np.arange(n_bins) / b)
    lens = np.minimum(np.round(Q * sample_rate / f).astype(int), max_kernel)
    n_max = int(lens.max())
    # (8,128)-friendly frame width keeps the downstream matmul MXU-tiled
    n_max = ((n_max + 127) // 128) * 128
    kern = np.zeros((n_max, 2 * n_bins), np.float32)
    for k in range(n_bins):
        N = int(lens[k])
        w = np.hanning(N)
        n = np.arange(N) - N / 2.0
        phase = -2.0 * np.pi * f[k] * n / sample_rate
        c = w * np.exp(1j * phase) * (2.0 / w.sum())
        s = (n_max - N) // 2  # center every kernel in the frame
        kern[s:s + N, 2 * k] = c.real.astype(np.float32)
        kern[s:s + N, 2 * k + 1] = c.imag.astype(np.float32)
    return kern, n_max, float(Q), float(b)


def cqt(
    x: jnp.ndarray,
    *,
    hop: int = 160,
    n_bins: int = 128,
    fmin: float = 32.7,
    fmax: float = 8000.0,
    sample_rate: int = 16_000,
    max_kernel: int = 16_384,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """True constant-Q transform, on device: waveform (B, T) -> log-power
    (B, T//hop, n_bins) with per-bin Q (geometric centers AND geometrically
    scaled analysis windows — unlike the 'log'-scale STFT path, whose fixed
    window gives every bin the same absolute bandwidth).

    TPU-native formulation: ONE matmul of overlapping frames against the
    complex kernel bank — (B*T', N_max) x (N_max, 2*n_bins) hits the MXU
    once; no per-bin loops, no multi-resolution FFT plumbing."""
    kern_np, n_max, _, _ = _cqt_kernels(n_bins, fmin, fmax, sample_rate,
                                        max_kernel)
    if x.shape[-1] <= n_max // 2:
        raise ValueError(
            f"cqt needs waveforms longer than half its longest analysis "
            f"window ({n_max // 2} samples = {n_max / 2 / sample_rate:.2f} s "
            f"at fmin={fmin}); got {x.shape[-1]} samples — raise fmin, "
            f"lower max_kernel, or feed longer audio")
    frames = frame_signal(x, n_max, hop)  # (B, T', N_max)
    kern = jnp.asarray(kern_np)
    proj = jnp.einsum("btn,nm->btm", frames, kern,
                      preferred_element_type=jnp.float32)
    re = proj[..., 0::2]
    im = proj[..., 1::2]
    return jnp.log(re * re + im * im + eps)


def cqt_design(n_bins: int, fmin: float, fmax: float, sample_rate: int,
               max_kernel: int = 16_384):
    """(center_freqs, kernel_lengths, Q, bins_per_octave) of the bank the
    cqt() above uses — exposed for tests and for consumers aligning labels
    to bins."""
    _, _, Q, b = _cqt_kernels(n_bins, fmin, fmax, sample_rate, max_kernel)
    f = fmin * 2.0 ** (np.arange(n_bins) / b)
    lens = np.minimum(np.round(Q * sample_rate / f).astype(int), max_kernel)
    return f, lens, Q, b


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
    """Waveform (B, T) -> log-power scalogram (B, T//hop, n_bins), on device.

    scale='mel'|'log' use a fixed n_fft STFT + triangular filterbank;
    scale='cqt' dispatches to the true constant-Q bank (per-bin windows)."""
    if scale == "cqt":
        return cqt(x, hop=hop, n_bins=n_bins, fmin=fmin, fmax=fmax,
                   sample_rate=sample_rate, eps=eps)
    frames = frame_signal(x, n_fft, hop)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2  # (B, frames, n_freqs)
    fb = jnp.asarray(_filterbank(n_fft, n_bins, fmin, fmax, sample_rate, scale))
    banded = jnp.einsum("btf,fm->btm", power, fb)
    return jnp.log(banded + eps)
