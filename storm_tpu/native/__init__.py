"""Native (C++) runtime components, bound via ctypes.

Currently: the WAV decode core for the data-loading hot path (wavio.cpp).
The shared library is built lazily with g++ on first import and cached next
to the sources; everything degrades gracefully to the numpy/scipy path if
no toolchain is available (see storm_tpu.data.audio).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libwavio.so")
_SRC_PATH = os.path.join(_HERE, "wavio.cpp")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wav_read.restype = ctypes.c_long
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def wav_info(path: str):
    """(sample_rate, channels, n_frames) via the native probe."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_long()
    rc = lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                      ctypes.byref(n))
    if rc != 0:
        raise IOError(f"wav_info failed for {path}")
    return sr.value, ch.value, n.value


def load_wav_native(path: str, max_channels: int = 8):
    """Decode a WAV natively -> (data (C, T) float32, sample_rate, absmax).

    absmax is max|x| over the full file (used for the reference's
    noisy-max normalization without a second pass)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    sr, ch, n = wav_info(path)
    out_ch = min(ch, max_channels)
    buf = np.empty((out_ch, n), dtype=np.float32)
    amax = ctypes.c_float()
    got = lib.wav_read(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(n),
        ctypes.c_int(out_ch),
        ctypes.byref(amax),
    )
    if got < 0:
        raise IOError(f"wav_read failed for {path}")
    return buf, sr, float(amax.value)
