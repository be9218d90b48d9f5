"""Asset decoding: BMP / TGA readers and Godot-style 3D texture slicing.

The reference imports its noise textures through Godot's resource importer:
`worlnoise.bmp` (1024×32, 24bpp) is sliced into a 32³ RGB volume and
`weather.bmp` (512², 24bpp) stays 2D (`cloud_sky/worlnoise.bmp.import:28-29`,
`cloud_sky/weather.bmp.import`). `perlworlnoise.tga` (128³ RGBA) is absent
from the mount (see /root/reference/.MISSING_LARGE_BLOBS) — the procedural
generators in `cloudscape_tpu.ops.noise` replace it.

Decoders are dependency-free (no PIL). A native C++ fast path lives in
`native/assetio.cpp`; `load_bmp` transparently uses it when built.
"""

from __future__ import annotations

import struct

import numpy as np


def load_bmp(path: str) -> np.ndarray:
    """Decode an uncompressed 24/32-bpp BMP to float32 [H, W, C] in [0, 1].

    Rows are returned top-down (texture convention: v=0 at the top), channels
    RGB(A).
    """
    try:
        from cloudscape_tpu.utils import _native

        arr = _native.load_bmp(path)
        if arr is not None:
            return arr
    except Exception:
        pass
    return _load_bmp_py(path)


def _load_bmp_py(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP file")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"{path}: unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"{path}: unsupported BMP (bpp={bpp}, compression={compression})")
    if compression == 3:
        # BI_BITFIELDS: the fast path below assumes BGR(A) byte order, so only
        # accept masks that spell exactly that layout (masks follow the info
        # header, same offsets for V4/V5 headers).
        r_m, g_m, b_m = struct.unpack_from("<III", data, 54)
        # Alpha mask exists only for V3+ headers; for the classic 40-byte
        # header, offset 66 is already past the three-mask section.
        a_m = (
            struct.unpack_from("<I", data, 66)[0]
            if header_size >= 56 and len(data) >= 70 else 0
        )
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF) or (
            bpp == 32 and a_m not in (0xFF000000, 0)
        ):
            raise ValueError(
                f"{path}: BI_BITFIELDS masks {(r_m, g_m, b_m, a_m)} are not "
                "the assumed BGR(A) layout"
            )
    bottom_up = height > 0
    height = abs(height)
    channels = bpp // 8
    stride = (width * channels + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=pixel_offset
    ).reshape(height, stride)[:, : width * channels]
    img = rows.reshape(height, width, channels)
    if bottom_up:
        img = img[::-1]
    # BGR(A) → RGB(A)
    if channels == 3:
        img = img[..., ::-1]
    else:
        img = img[..., [2, 1, 0, 3]]
    return np.ascontiguousarray(img).astype(np.float32) / 255.0


def load_tga(path: str) -> np.ndarray:
    """Decode an uncompressed or RLE true-color TGA to float32 [H, W, C]."""
    with open(path, "rb") as f:
        data = f.read()
    id_len, cmap_type, img_type = struct.unpack_from("<BBB", data, 0)
    width, height = struct.unpack_from("<HH", data, 12)
    bpp, descriptor = struct.unpack_from("<BB", data, 16)
    if cmap_type != 0 or img_type not in (2, 10) or bpp not in (24, 32):
        raise ValueError(f"{path}: unsupported TGA (type={img_type}, bpp={bpp})")
    channels = bpp // 8
    offset = 18 + id_len
    n_px = width * height
    if img_type == 2:
        px = np.frombuffer(data, dtype=np.uint8, count=n_px * channels, offset=offset)
        px = px.reshape(n_px, channels)
    else:  # RLE
        out = np.empty((n_px, channels), dtype=np.uint8)
        i, written = offset, 0
        while written < n_px:
            hdr = data[i]
            i += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run-length packet
                out[written : written + count] = np.frombuffer(
                    data, dtype=np.uint8, count=channels, offset=i
                )
                i += channels
            else:  # raw packet
                out[written : written + count] = np.frombuffer(
                    data, dtype=np.uint8, count=count * channels, offset=i
                ).reshape(count, channels)
                i += count * channels
            written += count
        px = out
    img = px.reshape(height, width, channels)
    if not (descriptor & 0x20):  # origin at bottom → flip to top-down
        img = img[::-1]
    if channels == 3:
        img = img[..., ::-1]
    else:
        img = img[..., [2, 1, 0, 3]]
    return np.ascontiguousarray(img).astype(np.float32) / 255.0


def slice_horizontal_3d(img: np.ndarray, slices: int) -> np.ndarray:
    """Godot 3D-texture import: a [H, slices*S, C] strip of horizontal slices
    → [D=slices, H, S, C] volume (`worlnoise.bmp.import:28-29`)."""
    try:
        from cloudscape_tpu.utils import _native

        out = _native.slice3d(np.asarray(img, np.float32), slices)
        if out is not None:
            return out
    except Exception:
        pass
    h, w, c = img.shape
    s = w // slices
    return np.ascontiguousarray(
        img.reshape(h, slices, s, c).transpose(1, 0, 2, 3)
    )
