// Fast PNG decoder for the metric pipelines' bulk image reads.
//
// The FID / segmentation / distance pipelines read back 10k+ generated
// PNGs per condition (reference workload: metrics/fid.py:90-131 walking
// sample directories).  PIL's decode path is CPU-bound on that scan; this
// decoder handles the baseline subset every pipeline artifact uses —
// 8-bit non-interlaced greyscale / RGB / RGBA (color types 0/2/6), zlib
// IDAT, filters 0-4 — and reports everything else as unsupported so the
// caller falls back to PIL.
//
// Exposed via ctypes (rewriting_tpu/native/__init__.py): png_get_info for
// dimensions, png_decode_rgb8 to produce packed RGB8.

#include <zlib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct Info {
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0, channels = 0;
};

const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

bool parse_ihdr(const uint8_t* data, size_t len, Info* info) {
  if (len < 8 + 25 || std::memcmp(data, kSig, 8) != 0) return false;
  const uint8_t* p = data + 8;
  if (be32(p) != 13 || std::memcmp(p + 4, "IHDR", 4) != 0) return false;
  info->w = be32(p + 8);
  info->h = be32(p + 12);
  info->bit_depth = p[16];
  info->color_type = p[17];
  info->interlace = p[20];
  switch (info->color_type) {
    case 0: info->channels = 1; break;  // grey
    case 2: info->channels = 3; break;  // rgb
    case 6: info->channels = 4; break;  // rgba
    default: return false;              // palette/grey+alpha: PIL fallback
  }
  return info->bit_depth == 8 && info->interlace == 0 && info->w > 0 &&
         info->h > 0;
}

bool inflate_idat(const uint8_t* data, size_t len, size_t need,
                  std::vector<uint8_t>* out) {
  out->resize(need);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_out = out->data();
  zs.avail_out = static_cast<uInt>(need);
  const uint8_t* p = data + 8 + 25;  // after IHDR
  const uint8_t* end = data + len;
  bool done = false;
  while (p + 12 <= end && !done) {
    uint32_t clen = be32(p);
    const char* type = reinterpret_cast<const char*>(p + 4);
    const uint8_t* cdata = p + 8;
    if (cdata + clen + 4 > end) break;
    if (std::memcmp(type, "IDAT", 4) == 0) {
      zs.next_in = const_cast<uint8_t*>(cdata);
      zs.avail_in = clen;
      int r = inflate(&zs, Z_NO_FLUSH);
      if (r == Z_STREAM_END) done = true;
      else if (r != Z_OK && r != Z_BUF_ERROR) { inflateEnd(&zs); return false; }
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    p = cdata + clen + 4;
  }
  bool ok = (zs.total_out == need);
  inflateEnd(&zs);
  return ok;
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

}  // namespace

extern "C" {

// Returns 0 on success; fills w/h/channels.  Nonzero: unsupported (caller
// should fall back to PIL).
int png_get_info(const uint8_t* data, long len, int* w, int* h,
                 int* channels) {
  Info info;
  if (!parse_ihdr(data, static_cast<size_t>(len), &info)) return 1;
  *w = static_cast<int>(info.w);
  *h = static_cast<int>(info.h);
  *channels = info.channels;
  return 0;
}

// Decode into out (w*h*3 RGB8; alpha dropped, grey broadcast).  Returns 0
// on success, nonzero on unsupported/corrupt input.
int png_decode_rgb8(const uint8_t* data, long len, uint8_t* out) {
  Info info;
  if (!parse_ihdr(data, static_cast<size_t>(len), &info)) return 1;
  const size_t w = info.w, h = info.h, ch = info.channels;
  const size_t stride = w * ch;
  std::vector<uint8_t> raw;
  if (!inflate_idat(data, static_cast<size_t>(len), (stride + 1) * h, &raw))
    return 2;
  std::vector<uint8_t> prev(stride, 0), cur(stride);
  for (size_t y = 0; y < h; ++y) {
    const uint8_t* row = raw.data() + y * (stride + 1);
    const int filter = row[0];
    const uint8_t* src = row + 1;
    switch (filter) {
      case 0:
        std::memcpy(cur.data(), src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i)
          cur[i] = src[i] + (i >= ch ? cur[i - ch] : 0);
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i) cur[i] = src[i] + prev[i];
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i)
          cur[i] = src[i] +
                   ((int(i >= ch ? cur[i - ch] : 0) + int(prev[i])) >> 1);
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i)
          cur[i] = src[i] + paeth(i >= ch ? cur[i - ch] : 0, prev[i],
                                  i >= ch ? prev[i - ch] : 0);
        break;
      default:
        return 3;
    }
    uint8_t* dst = out + y * w * 3;
    if (ch == 3) {
      std::memcpy(dst, cur.data(), stride);
    } else if (ch == 4) {
      for (size_t x = 0; x < w; ++x) {
        dst[3 * x] = cur[4 * x];
        dst[3 * x + 1] = cur[4 * x + 1];
        dst[3 * x + 2] = cur[4 * x + 2];
      }
    } else {  // grey
      for (size_t x = 0; x < w; ++x) {
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = cur[x];
      }
    }
    std::swap(prev, cur);
  }
  return 0;
}

}  // extern "C"
