// Native host-side runtime for the TPU low-bit engine.
//
// Two roles, mirroring the reference's native split:
//  1. refconv2d_int8: OpenMP int8 -> int32 NHWC reference convolution —
//     the trusted slow oracle (reference cpp/int8conv/refConv2DForward.hpp:15-53,
//     which is NCHW/OpenMP over out-channels; here NHWC/OpenMP over batch*rows).
//  2. Host data pipeline: batched uint8 image -> normalized, quantized int8
//     NHWC tensors (+ int4 pack/unpack for checkpoint IO). On TPU systems this
//     preprocessing runs on the host CPU while the chip computes; it replaces
//     the reference's eager torch-GPU quantize path (quantization.py:113-141)
//     on the input side.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// int8 NHWC conv, int32 accumulate. x: (N,H,W,C), w: (KH,KW,C/groups,K),
// out: (N,OH,OW,K). stride/pad symmetric per-axis.
void refconv2d_int8(
    const int8_t* x, const int8_t* w, int32_t* out,
    int n, int h, int wd, int c,
    int kh, int kw, int k,
    int sh, int sw, int ph, int pw, int groups) {
  const int oh = (h + 2 * ph - kh) / sh + 1;
  const int ow = (wd + 2 * pw - kw) / sw + 1;
  const int cg = c / groups;
  const int kg = k / groups;
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < n; ++b) {
    for (int oy = 0; oy < oh; ++oy) {
      for (int ox = 0; ox < ow; ++ox) {
        for (int ko = 0; ko < k; ++ko) {
          const int g = ko / kg;
          int32_t acc = 0;
          for (int ky = 0; ky < kh; ++ky) {
            const int iy = oy * sh + ky - ph;
            if (iy < 0 || iy >= h) continue;
            for (int kx = 0; kx < kw; ++kx) {
              const int ix = ox * sw + kx - pw;
              if (ix < 0 || ix >= wd) continue;
              const int8_t* xp = x + (((int64_t)b * h + iy) * wd + ix) * c
                                 + g * cg;
              const int8_t* wp = w + (((int64_t)ky * kw + kx) * cg) * k + ko;
              for (int ci = 0; ci < cg; ++ci)
                acc += (int32_t)xp[ci] * (int32_t)wp[(int64_t)ci * k];
            }
          }
          out[(((int64_t)b * oh + oy) * ow + ox) * k + ko] = acc;
        }
      }
    }
  }
}

// uint8 HWC images -> normalized float -> symmetric int8 quantize, fused.
// imgs: (N,H,W,C) uint8; mean/std per channel (length C); out int8 NHWC.
// scale_out receives the single activation scale used.
void preprocess_quantize_u8(
    const uint8_t* imgs, int8_t* out,
    int n, int h, int w, int c,
    const float* mean, const float* std_,
    float act_scale) {
  const float inv = 1.0f / act_scale;
  const int64_t hw = (int64_t)h * w;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)n * hw; ++i) {
    const uint8_t* px = imgs + i * c;
    int8_t* po = out + i * c;
    for (int ci = 0; ci < c; ++ci) {
      float v = ((float)px[ci] / 255.0f - mean[ci]) / std_[ci];
      float q = nearbyintf(v * inv);
      q = q < -127.f ? -127.f : (q > 127.f ? 127.f : q);
      po[ci] = (int8_t)q;
    }
  }
}

// int4 nibble packing for checkpoint IO: values in [-8,7] stored one per
// int8 -> two per uint8 byte (lo = even index, hi = odd), matching
// quant/int4.py's convention.
void pack_int4(const int8_t* vals, uint8_t* out, int64_t n_pairs) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_pairs; ++i) {
    const uint8_t lo = (uint8_t)(vals[2 * i] & 0xF);
    const uint8_t hi = (uint8_t)(vals[2 * i + 1] & 0xF);
    out[i] = (uint8_t)((hi << 4) | lo);
  }
}

void unpack_int4(const uint8_t* packed, int8_t* out, int64_t n_pairs) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_pairs; ++i) {
    int8_t lo = (int8_t)(packed[i] & 0xF);
    int8_t hi = (int8_t)(packed[i] >> 4);
    if (lo >= 8) lo -= 16;
    if (hi >= 8) hi -= 16;
    out[2 * i] = lo;
    out[2 * i + 1] = hi;
  }
}

int omp_max_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
