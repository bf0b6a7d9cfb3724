"""On-device waveform DSP: dequantization, normalization, resampling.

The reference normalizes/frames on the host inside DataLoader workers
(SURVEY.md §3 "Audio dataset"); here the host ships raw int16 and the device
does the rest inside the jitted step (SURVEY.md §2 N0, BASELINE.json:5) —
int16 over PCIe is half the bytes of fp32, and the dequant+normalize fuses
into the first conv's HBM read.
"""

from __future__ import annotations

import functools

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


@functools.lru_cache(maxsize=8)
def _resample_kernel(sr_in: int, sr_out: int, width: int = 16):
    """Polyphase windowed-sinc kernel for rational resampling. Returns
    (h (phases, taps), up, down)."""
    g = np.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    taps = 2 * width * max(1, down // up) + 1
    cutoff = min(1.0, up / down)
    n = np.arange(taps * up) - (taps * up - 1) / 2.0
    h = cutoff * np.sinc(cutoff * n / up) * np.hanning(taps * up)
    return (h.reshape(-1, up).T * up).astype(np.float32), up, down


def resample(x: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """Rational-ratio windowed-sinc resampling on device: (B, T) -> (B, T').
    Window gathering + per-phase dot so XLA lowers it to batched matmuls."""
    if sr_in == sr_out:
        return x
    h, up, down = _resample_kernel(sr_in, sr_out)
    _, taps = h.shape
    B, T = x.shape
    pad = taps // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    out_len = (T * up) // down
    out_idx = jnp.arange(out_len)
    in_pos = (out_idx * down) // up
    phase = (out_idx * down) % up
    win_idx = in_pos[:, None] + jnp.arange(taps)[None, :]
    windows = xp[:, win_idx]  # (B, out_len, taps)
    kern = jnp.asarray(h)[phase]  # (out_len, taps)
    return jnp.einsum("bot,ot->bo", windows, kern)
