"""Native (C++) host-runtime components, compiled on demand.

The TPU compute path is JAX/XLA/Pallas; this package is the native layer
around it for host-side hot loops — currently the z-buffer point-cloud
projection that dominates ViSM training-pair assembly
(wan_dataset.py:433-470; the reference offloads it to torch_scatter CUDA).

Build model: a single ``g++ -O3 -shared`` invocation per source, cached by
content hash under ``~/.cache/more4d_native``; loaded via ctypes (no
pybind11 in this environment). Import never fails — ``available()`` reports
whether the native path is usable and callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.environ.get("MORE4D_NATIVE_CACHE",
                        os.path.expanduser("~/.cache/more4d_native"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_HERE, "zbuffer.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE, exist_ok=True)
    so_path = os.path.join(_CACHE, f"zbuffer_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", tmp, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            os.replace(tmp, so_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.zbuffer_project.restype = ctypes.c_int64
    lib.zbuffer_project.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _build_and_load()
                _tried = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def zbuffer_project_native(coords: np.ndarray, colors: np.ndarray,
                           h: int, w: int, intrinsic: np.ndarray):
    """coords [N,3] camera-space, colors [N,3], intrinsic normalized 3x3 ->
    (color [H,W,3], hole [H,W,3]); exact data/vism.py semantics."""
    lib = _get_lib()
    assert lib is not None, "native zbuffer unavailable"
    coords = np.ascontiguousarray(coords, np.float32)
    colors = np.ascontiguousarray(colors, np.float32)
    intr = np.ascontiguousarray(
        [intrinsic[0, 0], intrinsic[1, 1], intrinsic[0, 2],
         intrinsic[1, 2]], np.float32)
    out_color = np.empty((h, w, 3), np.float32)
    out_hole = np.empty((h, w), np.float32)
    fptr = lambda a: a.ctypes.data_as(  # noqa: E731
        ctypes.POINTER(ctypes.c_float))
    lib.zbuffer_project(fptr(coords), fptr(colors), coords.shape[0],
                        fptr(intr), h, w, fptr(out_color), fptr(out_hole))
    return out_color, np.repeat(out_hole[..., None], 3, axis=-1)
