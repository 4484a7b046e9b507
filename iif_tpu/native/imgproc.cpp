// Native image-processing helpers for the robustness-corruption suite.
//
// glass_shuffle: the sequential local pixel-swap at the heart of the
// ImageNet-C / imagecorruptions ``glass_blur`` corruption (reference
// protocol: tools/analysis_tools/test_robustness.py applies it through
// the imagecorruptions package). The swap is a raster-order sequential
// dependency (each swap sees earlier swaps), so it cannot be vectorized
// in numpy without changing semantics — a Python loop is ~10s per
// 800x1344 image; this is ~10ms.
//
// Build: g++ -O3 -shared -fPIC -o _imgproc.so imgproc.cpp
#include <cstdint>

extern "C" {

// xorshift64* — deterministic per seed, platform-independent.
static inline uint64_t xs64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  *s = x;
  return x * 0x2545F4914F6CDD1DULL;
}

// In-place local pixel shuffle over an interleaved HxWxC uint8 image.
// For ``iters`` passes, scan y from h-delta down to delta+1 and x from
// w-delta down to delta+1 (the imagecorruptions raster order) and swap
// pixel (y,x) with (y+dy, x+dx), dy/dx uniform on [-delta, delta-1]
// (numpy randint half-open convention).
void glass_shuffle(uint8_t* img, int64_t h, int64_t w, int64_t ch,
                   int64_t delta, int64_t iters, uint64_t seed) {
  if (delta < 1 || h <= 2 * delta || w <= 2 * delta) return;
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
  const uint64_t span = (uint64_t)(2 * delta);
  for (int64_t it = 0; it < iters; ++it) {
    for (int64_t y = h - delta; y > delta; --y) {
      for (int64_t x = w - delta; x > delta; --x) {
        int64_t dy = (int64_t)(xs64(&s) % span) - delta;
        int64_t dx = (int64_t)(xs64(&s) % span) - delta;
        int64_t yp = y + dy, xp = x + dx;
        uint8_t* a = img + (y * w + x) * ch;
        uint8_t* b = img + (yp * w + xp) * ch;
        for (int64_t c = 0; c < ch; ++c) {
          uint8_t t = a[c];
          a[c] = b[c];
          b[c] = t;
        }
      }
    }
  }
}

}  // extern "C"
