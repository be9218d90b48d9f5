// assetio: native asset pipeline for cloudscape_tpu.
//
// The reference delegates asset decoding, 3D-texture slicing and mip
// generation to the Godot engine's C++ importer (`*.import` recipes,
// SURVEY.md §2.9 / L0); this is the TPU framework's native equivalent —
// the host-side data path that feeds HBM: BMP decode, horizontal-strip →
// volume slicing, 2^k box-filter mip chains, and packing volumes into the
// 128-lane brick tables of ops/brick.py.
//
// Exposed as a plain C ABI consumed via ctypes (cloudscape_tpu/utils/_native.py);
// every entry point has a pure-Python fallback, so the extension is an
// accelerator, not a dependency.
//
// Build: python -m cloudscape_tpu.utils.build_native   (or `make -C native`).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BMP decode (24/32 bpp, uncompressed or BI_BITFIELDS) → float32 RGB(A),
// rows top-down, values in [0, 1].
//
// Returns 0 on success. Caller passes a buffer of h*w*channels floats
// obtained from assetio_bmp_info.

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static int32_t rd_i32(const uint8_t* p) { return (int32_t)rd_u32(p); }
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

static int read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return -1;
  }
  out.resize((size_t)n);
  size_t got = std::fread(out.data(), 1, (size_t)n, f);
  std::fclose(f);
  return got == (size_t)n ? 0 : -1;
}

// BI_BITFIELDS (compression=3): the decoders assume BGR(A) channel order, so
// accept only channel masks that spell exactly that layout (the masks live in
// the 3-4 DWORDs following the 40-byte info header / at the V4 header's fixed
// offsets — same place either way). Returns 0 iff the assumption holds.
static int bmp_bitfields_are_bgra(const std::vector<uint8_t>& d, uint16_t bpp) {
  if (d.size() < 66) return -1;
  uint32_t header_size = rd_u32(&d[14]);
  uint32_t rm = rd_u32(&d[54]), gm = rd_u32(&d[58]), bm = rd_u32(&d[62]);
  if (rm != 0x00FF0000u || gm != 0x0000FF00u || bm != 0x000000FFu) return -1;
  // An alpha mask exists only for V3+ headers (>= 56 bytes); for the classic
  // 40-byte header, offset 66 is already past the three-mask section.
  if (bpp == 32 && header_size >= 56 && d.size() >= 70) {
    uint32_t am = rd_u32(&d[66]);
    if (am != 0xFF000000u && am != 0u) return -1;
  }
  return 0;
}

int assetio_bmp_info(const char* path, int32_t* width, int32_t* height,
                     int32_t* channels) {
  std::vector<uint8_t> d;
  if (read_file(path, d) != 0 || d.size() < 54) return -1;
  if (d[0] != 'B' || d[1] != 'M') return -2;
  uint32_t header_size = rd_u32(&d[14]);
  if (header_size < 40) return -3;
  int32_t w = rd_i32(&d[18]);
  int32_t h = rd_i32(&d[22]);
  uint16_t bpp = rd_u16(&d[28]);
  uint32_t compression = rd_u32(&d[30]);
  if ((compression != 0 && compression != 3) || (bpp != 24 && bpp != 32))
    return -4;
  if (compression == 3 && bmp_bitfields_are_bgra(d, bpp) != 0) return -5;
  *width = w;
  *height = h < 0 ? -h : h;
  *channels = bpp / 8;
  return 0;
}

int assetio_bmp_decode(const char* path, float* out, int64_t out_len) {
  std::vector<uint8_t> d;
  // Full header bounds check: this C ABI entry point must be safe standalone
  // (not only after a prior assetio_bmp_info call on the same path).
  if (read_file(path, d) != 0 || d.size() < 54) return -1;
  uint32_t compression = rd_u32(&d[30]);
  uint32_t pixel_offset = rd_u32(&d[10]);
  int32_t w = rd_i32(&d[18]);
  int32_t h_raw = rd_i32(&d[22]);
  uint16_t bpp = rd_u16(&d[28]);
  if ((compression != 0 && compression != 3) || (bpp != 24 && bpp != 32))
    return -4;
  if (compression == 3 && bmp_bitfields_are_bgra(d, bpp) != 0) return -5;
  int bottom_up = h_raw > 0;
  int32_t h = h_raw > 0 ? h_raw : -h_raw;
  int ch = bpp / 8;
  if (out_len < (int64_t)w * h * ch) return -2;
  size_t stride = ((size_t)w * ch + 3) & ~(size_t)3;
  if (d.size() < pixel_offset + stride * (size_t)h) return -3;
  // Divide (not multiply-by-reciprocal): bit-exact vs the Python fallback.
  for (int32_t y = 0; y < h; ++y) {
    const uint8_t* row = &d[pixel_offset + stride * (size_t)(bottom_up ? h - 1 - y : y)];
    float* o = out + (int64_t)y * w * ch;
    if (ch == 3) {
      for (int32_t x = 0; x < w; ++x) {  // BGR → RGB
        o[x * 3 + 0] = row[x * 3 + 2] / 255.0f;
        o[x * 3 + 1] = row[x * 3 + 1] / 255.0f;
        o[x * 3 + 2] = row[x * 3 + 0] / 255.0f;
      }
    } else {
      for (int32_t x = 0; x < w; ++x) {  // BGRA → RGBA
        o[x * 4 + 0] = row[x * 4 + 2] / 255.0f;
        o[x * 4 + 1] = row[x * 4 + 1] / 255.0f;
        o[x * 4 + 2] = row[x * 4 + 0] / 255.0f;
        o[x * 4 + 3] = row[x * 4 + 3] / 255.0f;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Godot-style 3D slicing: [H, slices*S, C] horizontal strip → [slices, H, S, C]
// (`worlnoise.bmp.import:28-29`).

int assetio_slice3d(const float* img, int32_t h, int32_t w, int32_t c,
                    int32_t slices, float* out) {
  if (w % slices != 0) return -1;
  int32_t s = w / slices;
  for (int32_t z = 0; z < slices; ++z)
    for (int32_t y = 0; y < h; ++y)
      std::memcpy(out + (((int64_t)z * h + y) * s) * c,
                  img + ((int64_t)y * w + (int64_t)z * s) * c,
                  (size_t)s * c * sizeof(float));
  return 0;
}

// ---------------------------------------------------------------------------
// 2×2×2 box-filter mip level: [D, H, W, C] → [D/2, H/2, W/2, C].

int assetio_mip3d(const float* in, int32_t d, int32_t h, int32_t w, int32_t c,
                  float* out) {
  if (d % 2 || h % 2 || w % 2) return -1;
  int32_t d2 = d / 2, h2 = h / 2, w2 = w / 2;
  for (int32_t z = 0; z < d2; ++z)
    for (int32_t y = 0; y < h2; ++y)
      for (int32_t x = 0; x < w2; ++x)
        for (int32_t k = 0; k < c; ++k) {
          float acc = 0.0f;
          for (int32_t dz = 0; dz < 2; ++dz)
            for (int32_t dy = 0; dy < 2; ++dy)
              for (int32_t dx = 0; dx < 2; ++dx)
                acc += in[((((int64_t)(2 * z + dz) * h) + (2 * y + dy)) * w +
                           (2 * x + dx)) * c + k];
          out[((((int64_t)z * h2) + y) * w2 + x) * c + k] = acc * 0.125f;
        }
  return 0;
}

// ---------------------------------------------------------------------------
// Brick packing (ops/brick.py layout): volume [D, H, W, C] → table
// [nz*ny*nx, C*bz*by*bx], brick texels taken mod dims (wrap-aware), lane
// order channel-major then (z*by + y)*bx + x.

int assetio_pack_bricks3d(const float* vol, int32_t d, int32_t h, int32_t w,
                          int32_t c, int32_t bz, int32_t by, int32_t bx,
                          int32_t sz, int32_t sy, int32_t sx, float* out) {
  int32_t nz = (d + sz - 1) / sz, ny = (h + sy - 1) / sy, nx = (w + sx - 1) / sx;
  int32_t lanes = c * bz * by * bx;
  for (int32_t gz = 0; gz < nz; ++gz)
    for (int32_t gy = 0; gy < ny; ++gy)
      for (int32_t gx = 0; gx < nx; ++gx) {
        float* row = out + ((int64_t)(gz * ny + gy) * nx + gx) * lanes;
        for (int32_t k = 0; k < c; ++k)
          for (int32_t z = 0; z < bz; ++z) {
            int32_t zz = (gz * sz + z) % d;
            for (int32_t y = 0; y < by; ++y) {
              int32_t yy = (gy * sy + y) % h;
              for (int32_t x = 0; x < bx; ++x) {
                int32_t xx = (gx * sx + x) % w;
                row[k * bz * by * bx + (z * by + y) * bx + x] =
                    vol[((((int64_t)zz * h) + yy) * w + xx) * c + k];
              }
            }
          }
      }
  return 0;
}

}  // extern "C"
