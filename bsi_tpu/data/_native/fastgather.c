/* Fused batch gather + uint8->float32 normalization (+ optional horizontal
 * flip) for the host-side data path.
 *
 * The reference's data layer leans on torch's C++ DataLoader internals for
 * its batched reads (bsi/data/h5image.py __getitems__); our equivalent fuses
 * the index gather, the [0,255] -> [-1,1] conversion, and the flip
 * augmentation into one pass over the output buffer, halving host memory
 * traffic vs numpy's gather-then-convert (which materializes an intermediate
 * uint8 batch). Compiled on demand by bsi_tpu/data/fastgather.py; numpy is
 * the fallback.
 */

#include <stdint.h>

static const float LUT_STEP = 2.0f / 255.0f;

/* src: [n_rows, row_elems] uint8; idx: [n_idx] int64; out: [n_idx, row_elems] f32 */
void gather_normalize_u8(const uint8_t *src, const int64_t *idx,
                         int64_t n_idx, int64_t row_elems, float *out) {
  float lut[256];
  for (int v = 0; v < 256; v++) lut[v] = -1.0f + LUT_STEP * (float)v;
  for (int64_t i = 0; i < n_idx; i++) {
    const uint8_t *row = src + idx[i] * row_elems;
    float *dst = out + i * row_elems;
    for (int64_t j = 0; j < row_elems; j++) dst[j] = lut[row[j]];
  }
}

/* As above for [n_rows, h, w, c] images with per-sample horizontal flip. */
void gather_normalize_u8_flip(const uint8_t *src, const int64_t *idx,
                              const uint8_t *flip, int64_t n_idx, int64_t h,
                              int64_t w, int64_t c, float *out) {
  float lut[256];
  for (int v = 0; v < 256; v++) lut[v] = -1.0f + LUT_STEP * (float)v;
  const int64_t row_elems = h * w * c;
  for (int64_t i = 0; i < n_idx; i++) {
    const uint8_t *img = src + idx[i] * row_elems;
    float *dst = out + i * row_elems;
    if (!flip[i]) {
      for (int64_t j = 0; j < row_elems; j++) dst[j] = lut[img[j]];
    } else {
      for (int64_t y = 0; y < h; y++) {
        const uint8_t *srow = img + y * w * c;
        float *drow = dst + y * w * c;
        for (int64_t x = 0; x < w; x++) {
          const uint8_t *spx = srow + (w - 1 - x) * c;
          float *dpx = drow + x * c;
          for (int64_t ch = 0; ch < c; ch++) dpx[ch] = lut[spx[ch]];
        }
      }
    }
  }
}
