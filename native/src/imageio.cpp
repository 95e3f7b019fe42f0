// Image output path: model floats -> RGB8 -> PNG bytes (zlib).
//
// The serving-side "data path out" of the framework. PNG container written
// directly (IHDR / IDAT / IEND, filter 0 rows) over zlib's deflate — no
// libpng dependency. C ABI for ctypes.

#include <zlib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(static_cast<uint8_t>(x >> 24));
  v.push_back(static_cast<uint8_t>(x >> 16));
  v.push_back(static_cast<uint8_t>(x >> 8));
  v.push_back(static_cast<uint8_t>(x));
}

void put_chunk(std::vector<uint8_t>& v, const char type[4], const uint8_t* data,
               size_t n) {
  put_be32(v, static_cast<uint32_t>(n));
  size_t start = v.size();
  v.insert(v.end(), type, type + 4);
  if (n) v.insert(v.end(), data, data + n);
  uint32_t crc = crc32(0, v.data() + start, static_cast<uInt>(n + 4));
  put_be32(v, crc);
}

}  // namespace

extern "C" {

// [-1, 1] floats -> uint8 with round-to-nearest; clamps out-of-range.
void st_float_to_rgb8(const float* in, uint8_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float x = (in[i] + 1.0f) * 127.5f;
    if (x < 0.0f) x = 0.0f;
    if (x > 255.0f) x = 255.0f;
    out[i] = static_cast<uint8_t>(x + 0.5f);
  }
}

// Encode interleaved RGB8 (h, w, 3) as PNG. Returns byte count written to
// *out_buf (malloc'd; caller frees via st_free), or -1 on failure.
int64_t st_encode_png(const uint8_t* rgb, int64_t w, int64_t h, uint8_t** out_buf) {
  // raw stream: each row prefixed with filter byte 0
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (1 + 3 * w));
  for (int64_t y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + y * (1 + 3 * w);
    row[0] = 0;
    std::memcpy(row + 1, rgb + y * 3 * w, static_cast<size_t>(3 * w));
  }

  uLongf comp_cap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), static_cast<uLong>(raw.size()),
                6) != Z_OK)
    return -1;

  std::vector<uint8_t> png;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.insert(png.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = static_cast<uint8_t>(w >> 24);
  ihdr[1] = static_cast<uint8_t>(w >> 16);
  ihdr[2] = static_cast<uint8_t>(w >> 8);
  ihdr[3] = static_cast<uint8_t>(w);
  ihdr[4] = static_cast<uint8_t>(h >> 24);
  ihdr[5] = static_cast<uint8_t>(h >> 16);
  ihdr[6] = static_cast<uint8_t>(h >> 8);
  ihdr[7] = static_cast<uint8_t>(h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", comp.data(), comp_cap);
  put_chunk(png, "IEND", nullptr, 0);

  uint8_t* buf = static_cast<uint8_t*>(std::malloc(png.size()));
  if (!buf) return -1;
  std::memcpy(buf, png.data(), png.size());
  *out_buf = buf;
  return static_cast<int64_t>(png.size());
}

void st_free(void* p) { std::free(p); }

}  // extern "C"
