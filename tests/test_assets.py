"""Asset decoders: TGA (synthetic round-trip; the reference's
perlworlnoise.tga is absent so no fixture exists) and BMP edge cases."""

import struct

import numpy as np

from cloudscape_tpu.utils.assets import load_bmp, load_tga


def _write_tga_type2(path, img8, origin_top=True):
    h, w, c = img8.shape
    descriptor = 0x20 if origin_top else 0x00
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, c * 8,
                      descriptor)
    px = img8[..., ::-1] if c == 3 else img8[..., [2, 1, 0, 3]]  # RGB→BGR
    data = px if origin_top else px[::-1]
    with open(path, "wb") as f:
        f.write(hdr + data.tobytes())


def _write_tga_rle(path, img8):
    """Type-10 RLE, top-origin, encoded as alternating raw/run packets."""
    h, w, c = img8.shape
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, w, h, c * 8,
                      0x20)
    bgr = img8[..., ::-1]
    out = bytearray(hdr)
    flat = bgr.reshape(-1, c)
    i = 0
    while i < len(flat):
        # Emit a run packet if the next two pixels repeat, else a raw pixel.
        if i + 1 < len(flat) and (flat[i] == flat[i + 1]).all():
            run = 1
            while (i + run < len(flat) and run < 128
                   and (flat[i + run] == flat[i]).all()):
                run += 1
            out.append(0x80 | (run - 1))
            out += flat[i].tobytes()
            i += run
        else:
            out.append(0x00)
            out += flat[i].tobytes()
            i += 1
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_tga_type2_roundtrip(tmp_path, rng):
    img8 = (rng.uniform(0, 255, (12, 20, 3))).astype(np.uint8)
    p = str(tmp_path / "t2.tga")
    _write_tga_type2(p, img8, origin_top=True)
    got = load_tga(p)
    np.testing.assert_allclose(got, img8.astype(np.float32) / 255.0, atol=1e-7)


def test_tga_bottom_origin_flip(tmp_path, rng):
    img8 = (rng.uniform(0, 255, (8, 8, 3))).astype(np.uint8)
    p = str(tmp_path / "t2b.tga")
    _write_tga_type2(p, img8, origin_top=False)
    got = load_tga(p)
    np.testing.assert_allclose(got, img8.astype(np.float32) / 255.0, atol=1e-7)


def test_tga_rle_roundtrip(tmp_path, rng):
    img8 = np.repeat(
        (rng.uniform(0, 255, (6, 4, 3))).astype(np.uint8), 4, axis=1
    )  # runs of 4 exercise RLE packets
    p = str(tmp_path / "rle.tga")
    _write_tga_rle(p, img8)
    got = load_tga(p)
    np.testing.assert_allclose(got, img8.astype(np.float32) / 255.0, atol=1e-7)


def test_bmp_shapes_match_reference_assets():
    w = load_bmp("/root/reference/cloud_sky/weather.bmp")
    n = load_bmp("/root/reference/cloud_sky/worlnoise.bmp")
    assert w.shape == (512, 512, 3)
    assert n.shape == (32, 1024, 3)


def _synth_bitfields_bmp(path, masks, bpp=32, header_size=108, w=2, h=2):
    """Minimal BI_BITFIELDS BMP: V4 header (masks at 54/58/62/66) or classic
    40-byte header (3 masks appended after the header)."""
    import struct

    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    if header_size == 40:
        pixel_offset = 14 + 40 + 12  # header + 3 appended masks
        mask_bytes = struct.pack("<III", *masks[:3])
    else:
        pixel_offset = 14 + header_size
        mask_bytes = struct.pack("<IIII", *masks) + b"\0" * (header_size - 56)
    info = struct.pack(
        "<IiiHHIIiiII", header_size, w, h, 1, bpp, 3, stride * h, 2835, 2835,
        0, 0,
    )
    px = bytearray()
    for y in range(h):
        row = bytes(range(y * w * ch, y * w * ch + w * ch))
        px += row + b"\0" * (stride - len(row))
    data = (
        b"BM" + struct.pack("<IHHI", pixel_offset + len(px), 0, 0, pixel_offset)
        + info + mask_bytes + px
    )
    with open(path, "wb") as f:
        f.write(data)


def test_bitfields_bgra_masks_accepted(tmp_path):
    from cloudscape_tpu.utils.assets import _load_bmp_py, load_bmp

    p = str(tmp_path / "ok.bmp")
    _synth_bitfields_bmp(p, (0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000))
    a = _load_bmp_py(p)
    assert a.shape == (2, 2, 4)
    b = load_bmp(p)  # native fast path must agree
    np.testing.assert_array_equal(a, b)
    # Classic 40-byte header with 3 appended masks also accepted.
    p40 = str(tmp_path / "ok40.bmp")
    _synth_bitfields_bmp(p40, (0x00FF0000, 0x0000FF00, 0x000000FF, 0),
                         header_size=40)
    assert _load_bmp_py(p40).shape == (2, 2, 4)
    np.testing.assert_array_equal(_load_bmp_py(p40), load_bmp(p40))


def test_bitfields_swapped_masks_rejected(tmp_path):
    """Non-BGR(A) channel masks must be rejected, not silently decoded with
    swapped channels (would corrupt the weather map's type/coverage)."""
    import pytest

    from cloudscape_tpu.utils.assets import _load_bmp_py

    p = str(tmp_path / "rgba.bmp")
    _synth_bitfields_bmp(p, (0x000000FF, 0x0000FF00, 0x00FF0000, 0xFF000000))
    with pytest.raises(ValueError, match="BGR"):
        _load_bmp_py(p)
    # The native decoder must reject it too (negative rc → fallback raises).
    # Build on demand: this file sorts before test_native.py, which otherwise
    # does the first build of a fresh checkout.
    import ctypes
    import os

    from cloudscape_tpu.utils import build_native
    from cloudscape_tpu.utils import _native

    so = os.path.join(os.path.dirname(_native.__file__), "..", "..",
                      "native", "libassetio.so")
    if not os.path.exists(so) and not build_native.build(verbose=False):
        pytest.skip("no native toolchain available")
    lib = ctypes.CDLL(os.path.abspath(so))
    buf = (ctypes.c_float * 64)()
    rc = lib.assetio_bmp_decode(p.encode(), buf, ctypes.c_int64(64))
    assert rc < 0
