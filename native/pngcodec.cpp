// PNG scanline defilter — the byte-sequential part of PNG decode in C.
//
// The framework decodes PNGs without OpenCV: chunk parsing and zlib
// inflate happen in Python (zlib runs at C speed already), but reversing
// the per-scanline filters (PNG spec 4.5.4) is inherently sequential in
// the "left" neighbour, which is pathological in Python. This file does
// only that step, in place of cv2.imdecode's internals.
//
// Compiled into libsidpack.so (see native/Makefile) and bound via ctypes
// in lowlight_image_enhancement_tpu/utils/imgio.py, which carries a
// pure-Python fallback for when the native build is unavailable.

#include <cstdint>
#include <cstring>

extern "C" {

// Reverse PNG filters over `h` scanlines.
//   raw: h * (1 + stride) bytes — each row is [filter_type][stride bytes]
//   out: h * stride bytes, fully defiltered
//   bpp: bytes per complete pixel (PNG spec: filters operate at byte
//        granularity with the per-pixel byte offset)
// Returns 0 on success, -1 on an invalid filter type.
int png_defilter(const uint8_t* raw, int64_t h, int64_t stride, int bpp,
                 uint8_t* out) {
  if (h <= 0 || stride <= 0 || bpp <= 0) return -1;
  for (int64_t r = 0; r < h; ++r) {
    const uint8_t ft = raw[r * (stride + 1)];
    const uint8_t* in = raw + r * (stride + 1) + 1;
    uint8_t* cur = out + r * stride;
    const uint8_t* up = r > 0 ? out + (r - 1) * stride : nullptr;
    switch (ft) {
      case 0:  // None
        memcpy(cur, in, stride);
        break;
      case 1:  // Sub
        for (int64_t i = 0; i < bpp && i < stride; ++i) cur[i] = in[i];
        for (int64_t i = bpp; i < stride; ++i)
          cur[i] = static_cast<uint8_t>(in[i] + cur[i - bpp]);
        break;
      case 2:  // Up
        if (up) {
          for (int64_t i = 0; i < stride; ++i)
            cur[i] = static_cast<uint8_t>(in[i] + up[i]);
        } else {
          memcpy(cur, in, stride);
        }
        break;
      case 3:  // Average
        for (int64_t i = 0; i < stride; ++i) {
          const int left = i >= bpp ? cur[i - bpp] : 0;
          const int above = up ? up[i] : 0;
          cur[i] = static_cast<uint8_t>(in[i] + ((left + above) >> 1));
        }
        break;
      case 4:  // Paeth
        for (int64_t i = 0; i < stride; ++i) {
          const int a = i >= bpp ? cur[i - bpp] : 0;       // left
          const int b = up ? up[i] : 0;                    // above
          const int c = (up && i >= bpp) ? up[i - bpp] : 0;  // upper-left
          const int p = a + b - c;
          const int pa = p > a ? p - a : a - p;
          const int pb = p > b ? p - b : b - p;
          const int pc = p > c ? p - c : c - p;
          const int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          cur[i] = static_cast<uint8_t>(in[i] + pred);
        }
        break;
      default:
        return -1;
    }
  }
  return 0;
}

}  // extern "C"
