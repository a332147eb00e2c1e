"""Native (C++) runtime helpers, loaded via ctypes.

Build with `sh native/build.sh` (g++ only; no pybind11). Everything here is
optional: pure-Python fallbacks exist for each entry point, so the package
works without the shared library — the native path just makes host-side IO
fast (COLMAP decode: seconds -> milliseconds on 1e6-point scenes).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libcolmap_reader.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.isfile(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.colmap_read_points3d.restype = ctypes.c_int
        lib.colmap_read_images.restype = ctypes.c_int
        lib.colmap_read_cameras.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dp(arr: Optional[np.ndarray], ctype):
    return (
        arr.ctypes.data_as(ctypes.POINTER(ctype)) if arr is not None else None
    )


def read_points3d_xyz(path: str, with_rgb: bool = False):
    """(n, 3) float64 xyz [, (n, 3) uint8 rgb]."""
    lib = _load()
    assert lib is not None, "native library not built (sh native/build.sh)"
    n = ctypes.c_longlong()
    rc = lib.colmap_read_points3d(
        path.encode(), None, None, ctypes.byref(n)
    )
    assert rc == 0, f"colmap_read_points3d failed ({rc})"
    xyz = np.empty((n.value, 3), np.float64)
    rgb = np.empty((n.value, 3), np.uint8) if with_rgb else None
    rc = lib.colmap_read_points3d(
        path.encode(),
        _dp(xyz, ctypes.c_double),
        _dp(rgb, ctypes.c_ubyte),
        ctypes.byref(n),
    )
    assert rc == 0, f"colmap_read_points3d failed ({rc})"
    return (xyz, rgb) if with_rgb else xyz


def read_images_meta(path: str) -> Dict[str, np.ndarray]:
    """ids, qvec (n,4), tvec (n,3), camera_ids, names (list[str]) — the
    pose/name subset of images.bin (skips the 2-D point tracks, which the
    pipeline never uses: datasets/phototourism.py:119-123)."""
    lib = _load()
    assert lib is not None, "native library not built (sh native/build.sh)"
    n = ctypes.c_longlong()
    nb = ctypes.c_longlong()
    rc = lib.colmap_read_images(
        path.encode(), None, None, None, None, None, 0,
        ctypes.byref(n), ctypes.byref(nb),
    )
    assert rc == 0, f"colmap_read_images failed ({rc})"
    ids = np.empty(n.value, np.int32)
    qvec = np.empty((n.value, 4), np.float64)
    tvec = np.empty((n.value, 3), np.float64)
    cam_ids = np.empty(n.value, np.int32)
    names_buf = ctypes.create_string_buffer(nb.value)
    rc = lib.colmap_read_images(
        path.encode(),
        _dp(ids, ctypes.c_int),
        _dp(qvec, ctypes.c_double),
        _dp(tvec, ctypes.c_double),
        _dp(cam_ids, ctypes.c_int),
        names_buf,
        nb.value,
        ctypes.byref(n),
        ctypes.byref(nb),
    )
    assert rc == 0, f"colmap_read_images failed ({rc})"
    names = names_buf.raw.split(b"\x00")[: n.value]
    return {
        "ids": ids,
        "qvec": qvec,
        "tvec": tvec,
        "camera_ids": cam_ids,
        "names": [x.decode("utf-8") for x in names],
    }


def read_cameras_meta(path: str) -> Dict[str, np.ndarray]:
    """ids, model_ids, wh (n,2) int64, params (n,12) zero-padded."""
    lib = _load()
    assert lib is not None, "native library not built (sh native/build.sh)"
    n = ctypes.c_longlong()
    rc = lib.colmap_read_cameras(
        path.encode(), None, None, None, None, ctypes.byref(n)
    )
    assert rc == 0, f"colmap_read_cameras failed ({rc})"
    ids = np.empty(n.value, np.int32)
    model_ids = np.empty(n.value, np.int32)
    wh = np.empty((n.value, 2), np.int64)
    params = np.empty((n.value, 12), np.float64)
    rc = lib.colmap_read_cameras(
        path.encode(),
        _dp(ids, ctypes.c_int),
        _dp(model_ids, ctypes.c_int),
        _dp(wh, ctypes.c_longlong),
        _dp(params, ctypes.c_double),
        ctypes.byref(n),
    )
    assert rc == 0, f"colmap_read_cameras failed ({rc})"
    return {"ids": ids, "model_ids": model_ids, "wh": wh, "params": params}
