"""ctypes bindings for the native asset pipeline (native/assetio.cpp).

Loads `native/libassetio.so` if present (build with
`python -m cloudscape_tpu.utils.build_native`). Every function returns None
when the library is unavailable so callers fall back to pure Python — the
native layer is an accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_NATIVE_DIR, "libassetio.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.assetio_bmp_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.assetio_bmp_info.restype = ctypes.c_int
    lib.assetio_bmp_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.assetio_bmp_decode.restype = ctypes.c_int
    lib.assetio_slice3d.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.assetio_slice3d.restype = ctypes.c_int
    lib.assetio_mip3d.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.assetio_mip3d.restype = ctypes.c_int
    lib.assetio_pack_bricks3d.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.assetio_pack_bricks3d.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_bmp(path: str):
    """Native BMP decode → float32 [H, W, C] top-down RGB(A); None if n/a."""
    lib = _lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    if lib.assetio_bmp_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, c.value), np.float32)
    if lib.assetio_bmp_decode(path.encode(), _fptr(out), out.size) != 0:
        return None
    return out


def slice3d(img: np.ndarray, slices: int):
    lib = _lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((slices, h, w // slices, c), np.float32)
    if lib.assetio_slice3d(_fptr(img), h, w, c, slices, _fptr(out)) != 0:
        return None
    return out


def mip3d(vol: np.ndarray):
    lib = _lib()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    d, h, w, c = vol.shape
    if d % 2 or h % 2 or w % 2:
        return None
    out = np.empty((d // 2, h // 2, w // 2, c), np.float32)
    if lib.assetio_mip3d(_fptr(vol), d, h, w, c, _fptr(out)) != 0:
        return None
    return out


def pack_bricks3d(vol: np.ndarray, brick, stride):
    lib = _lib()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    d, h, w, c = vol.shape
    bz, by, bx = brick
    sz, sy, sx = stride
    nz, ny, nx = -(-d // sz), -(-h // sy), -(-w // sx)
    out = np.empty((nz * ny * nx, c * bz * by * bx), np.float32)
    rc = lib.assetio_pack_bricks3d(_fptr(vol), d, h, w, c, bz, by, bx,
                                   sz, sy, sx, _fptr(out))
    return out if rc == 0 else None
