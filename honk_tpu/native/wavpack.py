"""ctypes binding for the native batched WAV loader (wavpack.cc).

Builds the shared library on first use (g++, cached next to the source);
falls back to the pure-Python reader in data/wavio.py if the toolchain or
load fails. Set HONK_TPU_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libwavpack.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("HONK_TPU_NO_NATIVE"):
            return None
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                os.path.join(_HERE, "wavpack.cc")
            ):
                subprocess.run(
                    ["make", "-C", _HERE, "libwavpack.so"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.wavpack_load_files.restype = ctypes.c_int
            lib.wavpack_load_files.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            lib.wavpack_decode_one.restype = ctypes.c_int
            lib.wavpack_decode_one.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def load_files_packed(
    paths: list[str], target_len: int, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray] | None:
    """Decode many PCM wavs into a packed (N, target_len) int16 array.

    Returns (audio, lengths) or None if the native path is unavailable.
    Files that fail to decode get zeros and length -1 (caller decides).
    """
    lib = _load()
    if lib is None or not paths:
        return None
    n = len(paths)
    out = np.zeros((n, target_len), dtype=np.int16)
    lengths = np.zeros(n, dtype=np.int32)
    rates = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.wavpack_load_files(
        arr,
        n,
        target_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    return out, lengths


def decode_one(path: str, max_len: int) -> np.ndarray | None:
    """Decode one wav (up to max_len samples) as int16; None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(max_len, dtype=np.int16)
    sr = ctypes.c_int(0)
    n = lib.wavpack_decode_one(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), max_len, ctypes.byref(sr)
    )
    if n < 0:
        return None
    return out[:n]
