"""ctypes binding for the native FLAC decoder (cpc_tpu/data/native/flacdec.cpp).

Builds the shared library on first use (g++ is baked into the image; no
pybind11, per environment constraints) and caches it next to the source —
or, when the package directory is read-only (pip-installed into system
site-packages), under ~/.cache/cpc_tpu keyed by source mtime.
Registered automatically as the '.flac' decoder by cpc_tpu.data.dataset.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "flacdec.cpp")

_lock = threading.Lock()
_lib = None


def _so_path() -> str:
    """Preferred build target next to the source; a per-source-mtime file
    under ~/.cache/cpc_tpu when the package dir is not writable."""
    if os.access(_NATIVE_DIR, os.W_OK):
        return os.path.join(_NATIVE_DIR, "_flacdec.so")
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "cpc_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(
        cache, f"_flacdec-{int(os.path.getmtime(_SRC))}.so")


def _prune_stale_cache(so: str) -> None:
    """Drop cached builds keyed to other source mtimes, so package upgrades
    don't accumulate orphaned .so files in the user cache. Only entries
    untouched for an hour are removed: a concurrent process running a
    DIFFERENT package version may have just built its own keyed .so and be
    about to CDLL it (the in-process lock cannot cover that window)."""
    import glob
    import time
    cutoff = time.time() - 3600
    for old in glob.glob(os.path.join(os.path.dirname(so), "_flacdec-*.so")):
        try:
            if old != so and os.path.getmtime(old) < cutoff:
                os.unlink(old)
        except OSError:
            pass  # another process may race the same cleanup


def _build(so: str) -> None:
    # compile to a private temp name and rename atomically: a concurrent
    # process must never CDLL a half-written library (the threading lock
    # only covers this process)
    tmp = f"{so}.tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-o", tmp, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _so_path()
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            _build(so)
            if os.path.dirname(so) != _NATIVE_DIR:
                _prune_stale_cache(so)
        lib = ctypes.CDLL(so)
        lib.flac_decode_file.restype = ctypes.c_int
        lib.flac_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.flac_free.restype = None
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib


def flac_info(path: str) -> Tuple[int, int]:
    """(total_samples, sample_rate) from the STREAMINFO metadata block —
    pure Python, no native lib, no sample decode. total_samples may be 0
    when the encoder left it unknown; callers must fall back to a decode."""
    with open(path, "rb") as f:
        if f.read(4) != b"fLaC":
            raise ValueError(f"{path}: not a FLAC file")
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                raise ValueError(f"{path}: no STREAMINFO block")
            last = hdr[0] & 0x80
            btype = hdr[0] & 0x7F
            length = (hdr[1] << 16) | (hdr[2] << 8) | hdr[3]
            if btype == 0:  # STREAMINFO
                b = f.read(length)
                if len(b) < 18:
                    raise ValueError(f"{path}: truncated STREAMINFO")
                sr = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
                total = ((b[13] & 0x0F) << 32) | (b[14] << 24) | \
                    (b[15] << 16) | (b[16] << 8) | b[17]
                return total, sr
            f.seek(length, 1)
            if last:
                raise ValueError(f"{path}: no STREAMINFO block")


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Returns (samples (T, C) float32 in [-1, 1], sample_rate) — the same
    contract as cpc_tpu.data.wavio.read_wav."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    bps = ctypes.c_int32()
    rc = lib.flac_decode_file(path.encode(), ctypes.byref(out),
                              ctypes.byref(n), ctypes.byref(ch),
                              ctypes.byref(sr), ctypes.byref(bps))
    if rc != 0:
        raise ValueError(f"{path}: FLAC decode failed (code {rc})")
    try:
        count = n.value * ch.value
        arr = np.ctypeslib.as_array(out, shape=(count,)).copy()
    finally:
        lib.flac_free(out)
    x = arr.astype(np.float32) / float(1 << (bps.value - 1))
    return x.reshape(n.value, ch.value), sr.value
