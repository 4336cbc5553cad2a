"""Native C++ host runtime: TIFF decode, patch extraction, Hann blending.

Builds ``ddpm3d_native.cpp`` on demand with g++ (cached by source mtime) and
binds it via ctypes. Every entry point has a numpy fallback in the pure
Python layers; :func:`available` gates usage.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_SRC = osp.join(osp.dirname(osp.abspath(__file__)), "ddpm3d_native.cpp")
_CACHE_DIR = os.environ.get(
    "DDPM3D_NATIVE_CACHE", osp.expanduser("~/.cache/ddpm3d_tpu_native")
)

_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = osp.join(_CACHE_DIR, "ddpm3d_native.so")
    if osp.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", so_path + ".tmp",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("DDPM3D_NATIVE", "auto").lower() in ("0", "off", "false"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.ddpm3d_tiff_shape.argtypes = [ctypes.c_char_p, _i64p]
        lib.ddpm3d_tiff_shape.restype = ctypes.c_int
        lib.ddpm3d_tiff_read_f32.argtypes = [ctypes.c_char_p, _f32p, _i64]
        lib.ddpm3d_tiff_read_f32.restype = ctypes.c_int
        lib.ddpm3d_extract_patches.argtypes = [
            _f32p, _i64, _i64, _i64, _i64p, _i64, _i64, _f32p, ctypes.c_float,
        ]
        lib.ddpm3d_extract_patches.restype = ctypes.c_int
        lib.ddpm3d_blend_accumulate.argtypes = [
            _f32p, _i64p, _i64, _i64, _f32p, _f32p, _f32p, _i64, _i64, _i64,
        ]
        lib.ddpm3d_blend_accumulate.restype = ctypes.c_int
        lib.ddpm3d_blend_finalize.argtypes = [_f32p, _f32p, _f32p, _i64]
        lib.ddpm3d_blend_finalize.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def tiff_read(path: str) -> Optional[np.ndarray]:
    """Read a TIFF as float32; returns None if native IO is unavailable or
    the file needs the Python fallback. Shape (H,W) / (D,H,W) / (C,D,H,W)."""
    lib = _load()
    if lib is None:
        return None
    shape = np.zeros(4, np.int64)
    nd = lib.ddpm3d_tiff_shape(path.encode(), shape)
    if nd < 2:
        return None
    C, D, H, W = (int(x) for x in shape)
    out = np.empty(C * D * H * W, np.float32)
    if lib.ddpm3d_tiff_read_f32(path.encode(), out, out.size) != 0:
        return None
    if nd == 4:
        return out.reshape(C, D, H, W)
    if nd == 3:
        return out.reshape(D, H, W)
    return out.reshape(H, W)


def extract_patches(
    vol_zxy: np.ndarray, grid, patch_size: int, inv_div: float = 1.0
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol_zxy, np.float32)
    g = np.ascontiguousarray(np.asarray(grid, np.int64))
    n = g.shape[0]
    out = np.empty((n, patch_size, patch_size, patch_size), np.float32)
    Z, X, Y = vol.shape
    rc = lib.ddpm3d_extract_patches(
        vol, Z, X, Y, g.reshape(-1), n, patch_size, out.reshape(-1),
        np.float32(inv_div),
    )
    return out if rc == 0 else None


def blend_hann(
    patches_xyz: np.ndarray, grid, out_shape_xyz: Tuple[int, int, int],
    patch_size: int, window: np.ndarray,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(patches_xyz, np.float32)
    g = np.ascontiguousarray(np.asarray(grid, np.int64))
    w = np.ascontiguousarray(window, np.float32)
    X, Y, Z = out_shape_xyz
    acc = np.zeros(out_shape_xyz, np.float32)
    wgt = np.zeros(out_shape_xyz, np.float32)
    rc = lib.ddpm3d_blend_accumulate(
        p.reshape(-1), g.reshape(-1), g.shape[0], patch_size, w.reshape(-1),
        acc.reshape(-1), wgt.reshape(-1), X, Y, Z,
    )
    if rc != 0:
        return None
    out = np.empty_like(acc)
    lib.ddpm3d_blend_finalize(
        acc.reshape(-1), wgt.reshape(-1), out.reshape(-1), out.size
    )
    return out
