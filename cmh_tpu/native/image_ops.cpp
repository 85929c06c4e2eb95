// Host-side image preprocessing kernels for the data pipeline.
//
// Native equivalent of the PIL+torchvision transforms the reference uses on
// the host (/root/reference/dataset/transformer_dataset.py:34-45): fused
// crop → resize (bilinear/bicubic) → horizontal flip → [0,1] scale →
// mean/std normalize, from uint8 HWC RGB to float32 HWC, in one pass with
// no intermediate image allocations. Exposed through a C ABI for ctypes
// (no pybind11 in this image).
//
// Resampling follows PIL's convolution style: a triangle (bilinear) or
// Catmull-Rom-like cubic (a = -0.5, PIL's BICUBIC) filter whose support is
// scaled by the downsampling factor, which is what PIL.Image.resize does —
// naive point-sampled interpolation does NOT match PIL when minifying.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double triangle_filter(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

inline double bicubic_filter(double x) {
  // PIL's bicubic kernel with a = -0.5
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Weights {
  // for each output coordinate: first source index + contiguous weights
  std::vector<int> first;
  std::vector<int> count;
  std::vector<double> values;  // max_count per output, row-major
  int max_count = 0;
};

// Precompute 1-D resampling weights over a source span [src_lo, src_hi)
// mapped to out_size samples — PIL's ImagingResampleHorizontal logic.
Weights compute_weights(int out_size, double src_lo, double src_hi,
                        int src_limit, int mode) {
  double support_base = mode == 1 ? 2.0 : 1.0;
  double scale = (src_hi - src_lo) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = support_base * filterscale;
  int max_count = static_cast<int>(std::ceil(support)) * 2 + 1;

  Weights w;
  w.first.resize(out_size);
  w.count.resize(out_size);
  w.values.assign(static_cast<size_t>(out_size) * max_count, 0.0);
  w.max_count = max_count;

  for (int xx = 0; xx < out_size; ++xx) {
    double center = src_lo + (xx + 0.5) * scale;
    int xmin = std::max(0, static_cast<int>(center - support + 0.5));
    int xmax = std::min(src_limit, static_cast<int>(center + support + 0.5));
    double total = 0.0;
    int n = xmax - xmin;
    for (int i = 0; i < n; ++i) {
      double arg = (xmin + i - center + 0.5) / filterscale;
      double v = mode == 1 ? bicubic_filter(arg) : triangle_filter(arg);
      w.values[static_cast<size_t>(xx) * max_count + i] = v;
      total += v;
    }
    if (total != 0.0) {
      for (int i = 0; i < n; ++i) {
        w.values[static_cast<size_t>(xx) * max_count + i] /= total;
      }
    }
    w.first[xx] = xmin;
    w.count[xx] = n;
  }
  return w;
}

}  // namespace

extern "C" {

// src: uint8 HWC RGB (sh, sw, 3); crop box rows [cy, cy+ch), cols [cx, cx+cw)
// dst: float32 HWC (dh, dw, 3) = normalize(resize(flip?(crop(src))))
// mode: 0 = bilinear, 1 = bicubic
void crop_resize_normalize(const uint8_t* src, int sh, int sw, int cy, int cx,
                           int ch, int cw, float* dst, int dh, int dw,
                           int mode, const float* mean, const float* stdv,
                           int flip) {
  Weights wx = compute_weights(dw, cx, cx + static_cast<double>(cw), sw, mode);
  Weights wy = compute_weights(dh, cy, cy + static_cast<double>(ch), sh, mode);
  // horizontal pass into a (sh-bounded) intermediate of rows we touch
  // vertical range actually needed:
  int ymin_all = 1 << 30, ymax_all = 0;
  for (int y = 0; y < dh; ++y) {
    ymin_all = std::min(ymin_all, wy.first[y]);
    ymax_all = std::max(ymax_all, wy.first[y] + wy.count[y]);
  }
  int rows = ymax_all - ymin_all;
  std::vector<double> tmp(static_cast<size_t>(rows) * dw * 3, 0.0);

  for (int y = 0; y < rows; ++y) {
    const uint8_t* srow = src + (static_cast<size_t>(ymin_all + y) * sw) * 3;
    for (int x = 0; x < dw; ++x) {
      int out_x = flip ? (dw - 1 - x) : x;
      const double* wv = &wx.values[static_cast<size_t>(x) * wx.max_count];
      double acc[3] = {0, 0, 0};
      int x0 = wx.first[x], n = wx.count[x];
      for (int i = 0; i < n; ++i) {
        const uint8_t* px = srow + (static_cast<size_t>(x0 + i)) * 3;
        acc[0] += wv[i] * px[0];
        acc[1] += wv[i] * px[1];
        acc[2] += wv[i] * px[2];
      }
      double* t = &tmp[(static_cast<size_t>(y) * dw + out_x) * 3];
      t[0] = acc[0];
      t[1] = acc[1];
      t[2] = acc[2];
    }
  }

  for (int y = 0; y < dh; ++y) {
    const double* wv = &wy.values[static_cast<size_t>(y) * wy.max_count];
    int y0 = wy.first[y] - ymin_all, n = wy.count[y];
    for (int x = 0; x < dw; ++x) {
      double acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const double* t = &tmp[(static_cast<size_t>(y0 + i) * dw + x) * 3];
        acc[0] += wv[i] * t[0];
        acc[1] += wv[i] * t[1];
        acc[2] += wv[i] * t[2];
      }
      float* d = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        // PIL clips resampled uint8 output to [0, 255] before ToTensor
        double v = std::min(255.0, std::max(0.0, acc[c]));
        d[c] = static_cast<float>((v / 255.0 - mean[c]) / stdv[c]);
      }
    }
  }
}

void resize_normalize(const uint8_t* src, int sh, int sw, float* dst, int dh,
                      int dw, int mode, const float* mean, const float* stdv,
                      int flip) {
  crop_resize_normalize(src, sh, sw, 0, 0, sh, sw, dst, dh, dw, mode, mean,
                        stdv, flip);
}

}  // extern "C"
