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
    fmt_body = b""
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = _extensible_subformat(path, fmt_body)
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


def wav_info(path: str) -> Tuple[int, int]:
    """(num_frames, sample_rate) from the RIFF header alone — no sample
    decode. O(#chunks) seeks; used by the dataset's snippet-count scan so
    init over a large corpus never decodes audio (SURVEY.md §4.4)."""
    with open(path, "rb") as f:
        head = f.read(12)
        if len(head) < 12 or head[0:4] != b"RIFF" or head[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        n_channels = bits = None
        data_size = None
        sample_rate = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid = hdr[0:4]
            size = struct.unpack_from("<I", hdr, 4)[0]
            if cid == b"fmt ":
                body = f.read(size)
                _, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                    "<HHIIHH", body, 0)
            elif cid == b"data":
                data_size = size
                f.seek(size + (size & 1), 1)
            else:
                f.seek(size + (size & 1), 1)
            if cid == b"fmt " and size & 1:
                f.seek(1, 1)
    if n_channels is None or data_size is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    bytes_per_frame = n_channels * max(1, bits // 8)
    return data_size // bytes_per_frame, sample_rate


def _extensible_subformat(path: str, fmt_body: bytes) -> int:
    """WAVE_FORMAT_EXTENSIBLE: the real codec is the first two bytes of the
    SubFormat GUID at offset 24 of the fmt chunk (1=PCM, 3=IEEE float)."""
    if len(fmt_body) < 26:
        raise ValueError(f"{path}: extensible fmt chunk too short "
                         f"({len(fmt_body)} bytes) for a SubFormat GUID")
    sub = struct.unpack_from("<H", fmt_body, 24)[0]
    if sub not in (1, 3):
        raise ValueError(f"{path}: unsupported extensible SubFormat {sub}")
    return sub


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
