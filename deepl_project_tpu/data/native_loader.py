"""ctypes bindings for the native C++ image loader (native/image_loader.cpp).

Self-building: compiles the shared library on first use when a toolchain is
present (cached next to the source); falls back to the PIL path transparently
when unavailable, so the framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdeepl_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "image_loader.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "libdeepl_loader.so"],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dt_decode_file.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_float)]
        lib.dt_decode_file.restype = ctypes.c_int
        lib.dt_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.dt_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_file(path: str, resolution: int = 256) -> np.ndarray | None:
    """Decode+preprocess one image; None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((resolution, resolution, 3), np.float32)
    ok = lib.dt_decode_file(
        path.encode(), resolution,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if ok else None


def decode_batch(paths: list[str], resolution: int = 256,
                 num_threads: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode → ([N, res, res, 3] float32, [N] bool ok mask).

    The decode loop runs entirely in C++ threads (GIL released by ctypes), so
    it scales with host cores — the reference needed worker *processes* for
    this (ref: train.py:449-459).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), np.float32)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.dt_decode_batch(arr, n, resolution, num_threads,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out, ok.astype(bool)


def native_folder_batches(root: str, resolution: int = 256,
                          batch_size: int = 16, num_threads: int = 8,
                          shuffle: bool = True, seed: int = 42,
                          drop_last: bool = True):
    """Batch iterator over a folder tree using the native decoder."""
    import random

    from .datasets import IMAGE_EXTENSIONS

    files = []
    for dirpath, _, names in os.walk(root):
        for name in sorted(names):
            if name.lower().endswith(IMAGE_EXTENSIONS):
                files.append(os.path.join(dirpath, name))
    files.sort()
    if shuffle:
        random.Random(seed).shuffle(files)
    for i in range(0, len(files) - (batch_size - 1 if drop_last else 0),
                   batch_size):
        chunk = files[i:i + batch_size]
        batch, ok = decode_batch(chunk, resolution, num_threads)
        if ok.all():
            yield batch
        elif ok.any():
            yield batch[ok]
