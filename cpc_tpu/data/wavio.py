"""Minimal, dependency-free WAV read/write in numpy.

The reference leans on torchaudio/librosa for decode (SURVEY.md §3 "Audio
dataset"); this container has neither, so the host decode path is ours:
RIFF/WAVE parsing supporting PCM 8/16/24/32-bit and IEEE float32/64, mono or
multi-channel (channels are averaged to mono by the dataset layer, not here).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (samples (T, C) float32 in [-1, 1], sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(raw) > 0:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = 1  # assume PCM subformat
    if audio_format == 1:  # PCM
        if bits == 8:
            x = (raw_arr(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = raw_arr(raw, np.int16).astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = raw_arr(raw, np.int32).astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = raw_arr(raw, np.float32 if bits == 32 else np.float64).astype(
            np.float32)
    else:
        raise ValueError(f"{path}: unsupported audio format {audio_format}")
    if n_channels > 1:
        x = x[: (len(x) // n_channels) * n_channels].reshape(-1, n_channels)
    else:
        x = x.reshape(-1, 1)
    return x, sample_rate


def raw_arr(raw: bytes, dtype) -> np.ndarray:
    item = np.dtype(dtype).itemsize
    return np.frombuffer(raw[: (len(raw) // item) * item], dtype=dtype)


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Writes mono/multichannel float32 [-1, 1] as PCM16."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    n_channels = pcm.shape[1]
    byte_rate = sample_rate * n_channels * 2
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                            byte_rate, n_channels * 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)
