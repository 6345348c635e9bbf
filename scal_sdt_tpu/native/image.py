"""ctypes bindings for the native image pipeline (native/ssdt_image.cpp).

One C call does decode (DCT-scaled for JPEG) + Lanczos-3 cover-resize +
crop + [-1, 1] float32 normalize — the whole host-side hot path of the
input pipeline. ctypes releases the GIL during the call, so the Python
thread pool gets real decode parallelism.

``available()`` is False when the library hasn't been built
(``make -C native``); callers fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "libssdt_image.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ssdt_decode_resize_crop.restype = ctypes.c_int
    lib.ssdt_decode_resize_crop.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.ssdt_image_size.restype = ctypes.c_int
    lib.ssdt_image_size.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_resize_crop(path, target_w: int, target_h: int,
                       crop_x_frac: float = 0.5, crop_y_frac: float = 0.5) -> Optional[np.ndarray]:
    """-> (target_h, target_w, 3) float32 in [-1, 1], or None on failure
    (unsupported format — caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    data = Path(path).read_bytes()
    out = np.empty((target_h, target_w, 3), np.float32)
    rc = lib.ssdt_decode_resize_crop(
        data, len(data), target_w, target_h,
        float(crop_x_frac), float(crop_y_frac),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def image_size(path) -> Optional[tuple[int, int]]:
    """(w, h) from headers without full decode, or None."""
    lib = _load()
    if lib is None:
        return None
    data = Path(path).read_bytes()
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.ssdt_image_size(data, len(data), ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if rc == 0 else None
