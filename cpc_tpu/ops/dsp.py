"""On-device waveform DSP: dequantization, normalization, resampling.

The reference normalizes/frames on the host inside DataLoader workers
(SURVEY.md §3 "Audio dataset"); here the host ships raw int16 and the device
does the rest inside the jitted step (SURVEY.md §2 N0, BASELINE.json:5) —
int16 over PCIe is half the bytes of fp32, and the dequant+normalize fuses
into the first conv's HBM read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def dequantize(x: jnp.ndarray) -> jnp.ndarray:
    """int16 wire format -> float32 in [-1, 1]. No-op for float input."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) / 32768.0
    return x.astype(jnp.float32)


def normalize_snippets(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-snippet mean/variance normalization over the time axis."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def prepare_waveform(x: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    x = dequantize(x)
    if normalize:
        x = normalize_snippets(x)
    return x


def augment_waveform(
    x: jnp.ndarray,
    rng,
    *,
    gain_db: float = 6.0,
    noise_snr_db: float = 30.0,
    shift_max: int = 160,
    polarity: bool = True,
) -> jnp.ndarray:
    """On-device waveform augmentation (BASELINE.json:5 "resample/frame/
    augment on device"): per-snippet random gain, white noise at a random
    SNR, circular time shift (up to one latent stride), and polarity flip.
    Runs inside the jitted step; all randomness from the threaded PRNG key,
    so steps stay reproducible. x: (B, S) float32."""
    B, S = x.shape
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    gain = 10.0 ** (jax.random.uniform(k1, (B, 1), minval=-gain_db,
                                       maxval=gain_db) / 20.0)
    x = x * gain
    if polarity:
        sign = jnp.where(jax.random.bernoulli(k2, 0.5, (B, 1)), 1.0, -1.0)
        x = x * sign
    if shift_max > 0:
        shift = jax.random.randint(k3, (B,), -shift_max, shift_max + 1)
        idx = (jnp.arange(S)[None, :] + shift[:, None]) % S
        x = jnp.take_along_axis(x, idx, axis=1)
    if noise_snr_db < 100.0:
        sig_pow = jnp.mean(x ** 2, axis=1, keepdims=True)
        snr = 10.0 ** (jax.random.uniform(k4, (B, 1), minval=noise_snr_db,
                                          maxval=noise_snr_db + 20.0) / 10.0)
        noise = jax.random.normal(k5, (B, S)) * jnp.sqrt(sig_pow / snr)
        x = x + noise
    return x


@functools.lru_cache(maxsize=8)
def _resample_kernel(sr_in: int, sr_out: int, width: int = 16):
    """Per-phase windowed-sinc interpolation kernels for rational resampling.

    Output sample m sits at input position pos = m*down/up = n0 + p/up; the
    phase-p kernel is the (Hann-windowed, cutoff-scaled) sinc evaluated at
    the exact fractional offsets (q - half) - p/up for q in [0, taps).
    Returns (h (up, taps), up, down)."""
    g = np.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    half = width * max(1, -(-down // up))  # half-width in input samples
    taps = 2 * half + 1
    cutoff = min(1.0, up / down)
    q = np.arange(taps) - half
    t = q[None, :] - (np.arange(up) / up)[:, None]  # (up, taps)
    win = np.where(np.abs(t) <= half,
                   0.5 * (1.0 + np.cos(np.pi * t / half)), 0.0)
    h = cutoff * np.sinc(cutoff * t) * win
    return h.astype(np.float32), up, down


def resample(x: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """Rational-ratio windowed-sinc resampling on device: (B, T) -> (B, T').
    Window gathering + per-phase dot so XLA lowers it to batched matmuls."""
    if sr_in == sr_out:
        return x
    h, up, down = _resample_kernel(sr_in, sr_out)
    _, taps = h.shape
    half = taps // 2
    B, T = x.shape
    xp = jnp.pad(x, ((0, 0), (half, half)))
    out_len = (T * up) // down
    out_idx = jnp.arange(out_len)
    in_pos = (out_idx * down) // up   # n0
    phase = (out_idx * down) % up
    # xp[in_pos + q] == x[n0 + q - half]: exactly the kernel's q axis
    win_idx = in_pos[:, None] + jnp.arange(taps)[None, :]
    windows = xp[:, win_idx]  # (B, out_len, taps)
    kern = jnp.asarray(h)[phase]  # (out_len, taps)
    return jnp.einsum("bot,ot->bo", windows, kern)
