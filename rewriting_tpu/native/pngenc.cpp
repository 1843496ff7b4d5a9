// Fast PNG encoder for the image-saving runtime.
//
// The metric pipelines dump 10k+ generated images per condition (reference
// workload: metrics/sample.py writing through a multiprocess pool).  PIL's
// PNG path (optimize=True) is CPU-bound; this encoder writes baseline
// truecolor PNGs with per-row up-filtering and tunable zlib level, trading
// a little compression for large throughput.  Exposed to Python via ctypes
// (rewriting_tpu/native/__init__.py), with PIL as the fallback.
//
// Format: PNG signature, IHDR (8-bit RGB), one IDAT (zlib stream of
// filter-prefixed scanlines), IEND.  CRCs via zlib's crc32.

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out.data() + start, static_cast<uInt>(4 + len));
  put_be32(out, crc);
}

}  // namespace

extern "C" {

// Encode H x W x 3 RGB8 (row-major) into `out` (capacity outcap).
// Returns bytes written, or -(needed) if the buffer is too small, 0 on
// encode error.
long png_encode_rgb8(const uint8_t* data, int width, int height, int level,
                     uint8_t* out, long outcap) {
  const size_t stride = static_cast<size_t>(width) * 3;
  // Build filtered scanlines: "up" filter (type 2) compresses generated
  // images well and costs one subtract per byte.
  std::vector<uint8_t> raw((stride + 1) * height);
  for (int y = 0; y < height; ++y) {
    uint8_t* row = raw.data() + y * (stride + 1);
    const uint8_t* src = data + y * stride;
    if (y == 0) {
      row[0] = 0;  // no filter on first row
      std::memcpy(row + 1, src, stride);
    } else {
      row[0] = 2;  // up filter
      const uint8_t* prev = data + (y - 1) * stride;
      for (size_t i = 0; i < stride; ++i)
        row[1 + i] = static_cast<uint8_t>(src[i] - prev[i]);
    }
  }

  uLongf zcap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> zbuf(zcap);
  if (compress2(zbuf.data(), &zcap, raw.data(),
                static_cast<uLong>(raw.size()), level) != Z_OK)
    return 0;

  std::vector<uint8_t> png;
  png.reserve(zcap + 128);
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  png.insert(png.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (width >> 24) & 0xff;
  ihdr[1] = (width >> 16) & 0xff;
  ihdr[2] = (width >> 8) & 0xff;
  ihdr[3] = width & 0xff;
  ihdr[4] = (height >> 24) & 0xff;
  ihdr[5] = (height >> 16) & 0xff;
  ihdr[6] = (height >> 8) & 0xff;
  ihdr[7] = height & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // truecolor
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter method
  ihdr[12] = 0;  // no interlace
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", zbuf.data(), zcap);
  put_chunk(png, "IEND", nullptr, 0);

  if (static_cast<long>(png.size()) > outcap)
    return -static_cast<long>(png.size());
  std::memcpy(out, png.data(), png.size());
  return static_cast<long>(png.size());
}

}  // extern "C"
