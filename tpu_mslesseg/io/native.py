"""ctypes bindings for the native hostio library (native/hostio.cc).

Builds the shared library on first use (g++ + zlib + OpenMP) and exposes:
* `write_gray_png(path, img)`         — single PNG
* `write_gray_png_batch(paths, imgs)` — OpenMP-parallel batch writer
* `gzip_bytes(data)`                  — gzip container compression

Falls back gracefully (``available() == False``) when no toolchain exists;
callers (io/png.py) then use the PIL path.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "hostio.cc"
_LIB = _REPO_ROOT / "native" / "libhostio.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-fopenmp",
                str(_SRC), "-lz", "-o", str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.hostio_write_gray_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.hostio_write_gray_png.restype = ctypes.c_int
        lib.hostio_write_gray_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.hostio_write_gray_png_batch.restype = ctypes.c_int
        lib.hostio_gzip.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
        ]
        lib.hostio_gzip.restype = ctypes.c_long
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def write_gray_png(path, img: np.ndarray, level: int = 6) -> bool:
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    rc = lib.hostio_write_gray_png(
        str(path).encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, level,
    )
    return rc == 0


def write_gray_png_batch(paths, imgs: np.ndarray, level: int = 6,
                         threads: int = 0) -> bool:
    """Write imgs[i] -> paths[i] in parallel. imgs: [N, H, W] uint8."""
    lib = _load()
    if lib is None:
        return False
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w = imgs.shape
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failures = lib.hostio_write_gray_png_batch(
        arr, imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, level, threads,
    )
    return failures == 0


def gzip_bytes(data: bytes, level: int = 1) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    cap = len(data) + (len(data) >> 9) + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.hostio_gzip(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap, level,
    )
    if n < 0:
        return None
    return out[:n].tobytes()
