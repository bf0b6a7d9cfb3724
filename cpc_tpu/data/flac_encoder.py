"""Minimal pure-Python FLAC encoder.

Exists so the native decoder (cpc_tpu/data/native/flacdec.cpp) can be
round-trip tested hermetically — the image has no FLAC tooling — and as a
small utility for writing LibriSpeech-layout synthetic corpora in the real
on-disk format. Supports 8/16/24-bit PCM, mono/stereo, CONSTANT / VERBATIM /
FIXED(0-2)+Rice subframes, and independent / mid-side / left-side stereo
encodings.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_code(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F),
                      0x80 | (n & 0x3F)])
    raise ValueError("frame index too large for this encoder")


_SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
             24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r.astype(np.int64) << 1,
                    ((-r.astype(np.int64)) << 1) - 1)


def _write_residual(bw: _BitWriter, res: np.ndarray):
    """Single-partition Rice residual with a simple parameter estimate."""
    bw.write(0, 2)   # method: RICE (4-bit params)
    bw.write(0, 4)   # partition order 0
    zz = _zigzag(res)
    mean = max(float(zz.mean()), 0.1) if len(zz) else 0.1
    param = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
    bw.write(param, 4)
    for v in zz:
        bw.write_unary(int(v) >> param)
        bw.write(int(v), param)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int, mode: str):
    x = x.astype(np.int64)
    if mode == "auto":
        if np.all(x == x[0]):
            mode = "constant"
        else:
            mode = "fixed2" if len(x) > 4 else "verbatim"
    bw.write(0, 1)  # reserved
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
    elif mode in ("fixed0", "fixed1", "fixed2"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v), bps)
        if order == 0:
            res = x
        elif order == 1:
            res = x[1:] - x[:-1]
        else:
            res = x[2:] - 2 * x[1:-1] + x[:-2]
        _write_residual(bw, res)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


def write_flac(
    path: str,
    samples: np.ndarray,
    sample_rate: int,
    *,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    subframe: str = "auto",     # 'auto'|'constant'|'verbatim'|'fixed0/1/2'
    stereo_mode: str = "independent",  # 'independent'|'mid_side'|'left_side'
):
    """samples: float32 (T,) or (T, C) in [-1, 1], or integer PCM."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if np.issubdtype(x.dtype, np.floating):
        scale = (1 << (bits_per_sample - 1)) - 1
        x = np.clip(np.round(x * scale), -scale - 1, scale).astype(np.int64)
    T, C = x.shape
    if C > 2 and stereo_mode != "independent":
        raise ValueError("stereo modes need exactly 2 channels")
    if sample_rate not in _SR_CODES:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    if bits_per_sample not in _BPS_CODES:
        raise ValueError(f"unsupported bit depth {bits_per_sample}")

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(C - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(T, 36)
    body = si.data() + b"\x00" * 16  # MD5 unset (decoders don't require it)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    n_frames = (T + block_size - 1) // block_size
    for fi in range(n_frames):
        blk = x[fi * block_size:(fi + 1) * block_size]
        bs = len(blk)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        if bs == block_size and block_size in (256, 512, 1024, 2048, 4096,
                                               8192, 16384, 32768):
            bs_code = {256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                       8192: 13, 16384: 14, 32768: 15}[block_size]
            custom_bs = None
        else:
            bs_code, custom_bs = 7, bs - 1
        hdr.write(bs_code, 4)
        hdr.write(_SR_CODES[sample_rate], 4)
        if C == 2 and stereo_mode == "mid_side":
            hdr.write(10, 4)
        elif C == 2 and stereo_mode == "left_side":
            hdr.write(8, 4)
        else:
            hdr.write(C - 1, 4)
        hdr.write(_BPS_CODES[bits_per_sample], 3)
        hdr.write(0, 1)
        hdr.align()
        hbytes = bytearray(hdr.data())
        hbytes += _utf8_code(fi)
        if custom_bs is not None:
            hbytes += struct.pack(">H", custom_bs)
        hbytes.append(_crc8(bytes(hbytes)))

        fb = _BitWriter()
        if C == 2 and stereo_mode == "mid_side":
            l, r = blk[:, 0], blk[:, 1]
            side = l - r
            mid = (l + r) >> 1
            _encode_subframe(fb, mid, bits_per_sample, subframe)
            _encode_subframe(fb, side, bits_per_sample + 1, subframe)
        elif C == 2 and stereo_mode == "left_side":
            l, r = blk[:, 0], blk[:, 1]
            _encode_subframe(fb, l, bits_per_sample, subframe)
            _encode_subframe(fb, l - r, bits_per_sample + 1, subframe)
        else:
            for c in range(C):
                _encode_subframe(fb, blk[:, c], bits_per_sample, subframe)
        fb.align()
        frame = bytes(hbytes) + fb.data()
        frame += struct.pack(">H", _crc16(frame))
        out += frame

    with open(path, "wb") as f:
        f.write(bytes(out))
