"""ctypes binding for the native C++ JPEG decode + letterbox library.

``native/loader.cc`` implements the host data-path hot loop (decode ->
pad-to-square -> antialiased triangle resize) natively; this module builds it
on demand (``make -C native``) and falls back to the PIL path transparently
when the toolchain or libjpeg is unavailable.

Numerics: the native resampler is an antialiased bilinear (PIL BILINEAR
equivalent); trees loaded natively use it for both axes.  The calibrator's
byte-faithful PIL-BICUBIC crops are unaffected (they go through
data/calibrator.py's PIL path).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgcssl_loader.so"
_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.gcssl_decode_letterbox_batch.restype = ctypes.c_int
        lib.gcssl_decode_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_letterbox_batch(
    paths: list[str | Path], out_size: int, fill: int = 114
) -> tuple[np.ndarray, np.ndarray] | None:
    """Decode+letterbox a list of JPEGs natively.

    Returns (images (N, S, S, 3) uint8, orig_wh (N, 2) float32), or None if
    the native library is unavailable (caller falls back to PIL).  Files
    that fail to decode come back as solid fill with wh == 0 (the caller
    may re-try those via PIL — e.g. PNG/BMP inputs).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    wh = np.empty((n, 2), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.gcssl_decode_letterbox_batch(
        c_paths,
        n,
        out_size,
        fill,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        wh.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, wh
