// Native separable bilinear (antialiased triangle-kernel) image resize.
//
// Semantics match jax.image.resize(method="bilinear", antialias=True)
// with half-pixel centers — the same weights as the Python reference
// implementation in research_image_retrieval_tpu/index/extract.py
// (_resize_taps): per output sample o,
//   sample_f = (o + 0.5) * (in/out) - 0.5
//   kernel_scale = max(in/out, 1.0)
//   w(i) = max(0, 1 - |sample_f - i| / kernel_scale), zeroed outside
//   [0, in), normalized to sum 1.
//
// This is the host-side hot path of multi-scale descriptor extraction
// (reference contract: utils/helpfunc.py:30-46 resizes every eval image
// by each scale): at the 1024px eval operating point the dense-matmul
// host resize costs ~150 ms/image on the 1-core rig, starving the chip.
// The kernel has at most 2*ceil(1/scale)+1 nonzero taps per output, so
// a separable two-pass gather is ~500x less work; this C++ version also
// avoids the [out, taps, W, C] numpy temporaries and lets the compiler
// vectorize the innermost row accumulation.
//
// Exported C ABI (ctypes-loaded; no pybind11 on this rig):
//   rir_resize_bilinear(in, H, W, C, out, h, w) -> 0 on success.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Taps {
  int k = 0;                    // taps per output sample
  std::vector<int> idx;         // [out * k] clamped input indices
  std::vector<float> w;         // [out * k] normalized weights
};

// Triangle-kernel taps for in_size -> out_size (see file header).
Taps make_taps(int in_size, int out_size) {
  Taps t;
  const double inv_scale = static_cast<double>(in_size) / out_size;
  const double kscale = inv_scale > 1.0 ? inv_scale : 1.0;
  t.k = 2 * static_cast<int>(std::ceil(kscale)) + 1;
  t.idx.assign(static_cast<size_t>(out_size) * t.k, 0);
  t.w.assign(static_cast<size_t>(out_size) * t.k, 0.0f);
  for (int o = 0; o < out_size; ++o) {
    const double sample_f = (o + 0.5) * inv_scale - 0.5;
    const int start = static_cast<int>(std::ceil(sample_f - kscale));
    double total = 0.0;
    std::vector<double> wd(t.k, 0.0);
    for (int j = 0; j < t.k; ++j) {
      const int i = start + j;
      if (i < 0 || i >= in_size) continue;
      const double x = std::fabs(sample_f - i) / kscale;
      const double wgt = x < 1.0 ? 1.0 - x : 0.0;
      wd[j] = wgt;
      total += wgt;
    }
    for (int j = 0; j < t.k; ++j) {
      const int i = start + j;
      int ic = i < 0 ? 0 : (i >= in_size ? in_size - 1 : i);
      t.idx[static_cast<size_t>(o) * t.k + j] = ic;
      t.w[static_cast<size_t>(o) * t.k + j] =
          std::fabs(total) > 1e-7 ? static_cast<float>(wd[j] / total) : 0.0f;
    }
  }
  return t;
}

}  // namespace

extern "C" {

// Resize [H, W, C] float32 (row-major) to [h, w, C].  Returns 0 on
// success, nonzero on bad arguments.
int rir_resize_bilinear(const float* in, int H, int W, int C, float* out,
                        int h, int w) {
  if (!in || !out || H <= 0 || W <= 0 || C <= 0 || h <= 0 || w <= 0)
    return 1;
  const Taps th = make_taps(H, h);
  const Taps tw = make_taps(W, w);

  // Pass 1 (rows): [H, W, C] -> [h, W, C].  The inner accumulation runs
  // over the contiguous W*C row, which the compiler vectorizes.
  const size_t row = static_cast<size_t>(W) * C;
  std::vector<float> tmp(static_cast<size_t>(h) * row);
  for (int o = 0; o < h; ++o) {
    float* dst = tmp.data() + static_cast<size_t>(o) * row;
    std::memset(dst, 0, row * sizeof(float));
    for (int j = 0; j < th.k; ++j) {
      const float wgt = th.w[static_cast<size_t>(o) * th.k + j];
      if (wgt == 0.0f) continue;
      const float* src =
          in + static_cast<size_t>(th.idx[static_cast<size_t>(o) * th.k + j]) *
                   row;
      for (size_t p = 0; p < row; ++p) dst[p] += wgt * src[p];
    }
  }

  // Pass 2 (cols): [h, W, C] -> [h, w, C].  Accumulate each output row
  // in a small stack buffer so writes stay sequential.
  for (int i = 0; i < h; ++i) {
    const float* src_row = tmp.data() + static_cast<size_t>(i) * row;
    float* dst_row = out + static_cast<size_t>(i) * w * C;
    for (int o = 0; o < w; ++o) {
      float acc[16];  // C <= 16 fast path; larger C handled below
      if (C <= 16) {
        for (int c = 0; c < C; ++c) acc[c] = 0.0f;
        for (int j = 0; j < tw.k; ++j) {
          const float wgt = tw.w[static_cast<size_t>(o) * tw.k + j];
          if (wgt == 0.0f) continue;
          const float* s =
              src_row +
              static_cast<size_t>(tw.idx[static_cast<size_t>(o) * tw.k + j]) *
                  C;
          for (int c = 0; c < C; ++c) acc[c] += wgt * s[c];
        }
        for (int c = 0; c < C; ++c) dst_row[static_cast<size_t>(o) * C + c] = acc[c];
      } else {
        float* d = dst_row + static_cast<size_t>(o) * C;
        for (int c = 0; c < C; ++c) d[c] = 0.0f;
        for (int j = 0; j < tw.k; ++j) {
          const float wgt = tw.w[static_cast<size_t>(o) * tw.k + j];
          if (wgt == 0.0f) continue;
          const float* s =
              src_row +
              static_cast<size_t>(tw.idx[static_cast<size_t>(o) * tw.k + j]) *
                  C;
          for (int c = 0; c < C; ++c) d[c] += wgt * s[c];
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
