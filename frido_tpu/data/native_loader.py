"""ctypes bindings for the native C++ image-loading core.

``native/frido_native.cpp`` does the pixel work (libjpeg decode,
PIL-compatible antialiased bilinear, crop/flip/normalize) on a persistent
thread pool, filling whole ``[N, S, S, 3]`` float32 batches in one call.
Randomness (crop rects, flip coins) stays in Python so the reference's
annotation-remapping semantics are untouched.

The library is compiled on first use (``make -C native``) and cached;
``available()`` gates every caller, with the PIL pipeline as fallback —
set ``FRIDO_NATIVE_LOADER=0`` to force PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libfrido_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if os.environ.get("FRIDO_NATIVE_LOADER", "1") == "0":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.ft_load_one.argtypes = [
            ctypes.c_char_p] + [ctypes.c_int] * 8 + [
            ctypes.POINTER(ctypes.c_float)]
        lib.ft_load_one.restype = ctypes.c_int
        lib.ft_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.ft_load_batch.restype = ctypes.c_int
        lib.ft_jpeg_dims.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
        lib.ft_jpeg_dims.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(path: str):
    """(width, height) from the JPEG header (no pixel decode); None when
    the file isn't a readable JPEG."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.ft_jpeg_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    return w.value, h.value


def load_one(path: str, out_size: int, *, resize_to=None, crop=None,
             flip: bool = False) -> np.ndarray:
    """Decode + process one JPEG to [-1, 1] float32 [S, S, 3].

    resize_to: optional (w, h) pre-resize (shorter-side semantics computed
      by the caller); crop: optional (x, y, w, h) rect in the pre-resized
      (or original) space.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    rw, rh = resize_to if resize_to else (0, 0)
    cx, cy, cw, ch = crop if crop else (0, 0, 0, 0)
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = lib.ft_load_one(
        path.encode(), rw, rh, cx, cy, cw, ch, int(flip), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native load failed ({rc}) for {path}")
    return out


def load_batch(paths: Sequence[str], specs: np.ndarray, out_size: int,
               threads: int = 0) -> np.ndarray:
    """Fill a [N, S, S, 3] batch in parallel.

    specs: int32 [N, 7] of (rw, rh, cx, cy, cw, ch, flip); rw<=0 = no
    pre-resize, cw<=0 = no crop. Failed samples come back zeroed (count
    returned by the C call is raised as an error)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    specs = np.ascontiguousarray(specs, np.int32)
    assert specs.shape == (n, 7)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.ft_load_batch(
        arr, specs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        threads or os.cpu_count() or 8)
    if failures:
        raise IOError(f"native batch load: {failures}/{n} samples failed")
    return out
