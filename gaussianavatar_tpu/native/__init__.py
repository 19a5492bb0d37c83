"""ctypes bindings for the C++ runtime library (image decode + threaded batch
loading + UV rasterization). Compiled on first use with g++ and cached next
to the source; every caller has a pure-Python fallback, so the framework
works (slower) when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gsavatar_native.cpp")
_LIB = os.path.join(_HERE, "libgsavatar_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB, "-lpng", "-ljpeg", "-pthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
        if r.returncode != 0:
            print("gsavatar_native build failed:\n" + r.stderr[-2000:])
            return False
        return True
    except Exception as e:  # g++ missing etc.
        print(f"gsavatar_native build unavailable: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            print(f"gsavatar_native load failed: {e}")
            return None

        lib.gs_image_size.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.gs_image_size.restype = ctypes.c_int
        lib.gs_load_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.gs_load_frame.restype = ctypes.c_int
        lib.gs_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.gs_load_batch.restype = ctypes.c_int
        lib.gs_rasterize_uv.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gs_rasterize_uv.restype = None
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def image_size(path: str):
    lib = get_lib()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.gs_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def load_frame(img_path: str, mask_path: Optional[str], bg: float, width: int, height: int) -> Optional[np.ndarray]:
    """Decode + composite one frame -> (3, H, W) float32, or None."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((3, height, width), np.float32)
    rc = lib.gs_load_frame(
        img_path.encode(), (mask_path or "").encode(), ctypes.c_float(bg),
        _fptr(out), width, height,
    )
    return out if rc == 0 else None


def load_batch(img_paths, mask_paths, bg: float, width: int, height: int,
               n_threads: int = 8) -> Optional[np.ndarray]:
    """Parallel decode of B frames -> (B, 3, H, W) float32, or None."""
    lib = get_lib()
    if lib is None:
        return None
    B = len(img_paths)
    out = np.empty((B, 3, height, width), np.float32)
    c_imgs = (ctypes.c_char_p * B)(*[p.encode() for p in img_paths])
    c_masks = None
    if mask_paths is not None:
        c_masks = (ctypes.c_char_p * B)(*[(p or "").encode() for p in mask_paths])
    rc = lib.gs_load_batch(c_imgs, c_masks, B, ctypes.c_float(bg), _fptr(out),
                           width, height, n_threads)
    return out if rc == 0 else None


def rasterize_uv(verts3d: np.ndarray, uvs: np.ndarray, faces_v: np.ndarray,
                 faces_vt: np.ndarray, size: int):
    """Native UV rasterization; returns (pos, fid, bary) or None."""
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts3d, np.float32)
    u = np.ascontiguousarray(uvs, np.float32)
    fv = np.ascontiguousarray(faces_v, np.int32)
    fvt = np.ascontiguousarray(faces_vt, np.int32)
    R = size
    pos = np.empty((R, R, 3), np.float32)
    fid = np.empty((R, R), np.int32)
    bary = np.empty((R, R, 3), np.float32)
    lib.gs_rasterize_uv(
        _fptr(v), _fptr(u),
        fv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fvt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(fv.shape[0]), R,
        _fptr(pos), fid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _fptr(bary),
    )
    return pos, fid, bary
