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
