// Native host-side image preprocessing: antialiased convolution resize
// (CatmullRom "bicubic" / bilinear / nearest) + center-crop + normalize.
//
// The C++ counterpart of the reference's fast_image_resize SIMD pipeline
// (reference: src/vision.rs:165-259): used for host-side preprocessing when
// the on-device matmul-resize path is not wanted (CPU-only environments,
// debugging) and as the decode-adjacent stage of the data pipeline. The
// sampling math matches clip_embedder_tpu/ops/preprocess.py exactly
// (Pillow-style precompute: scaled support, edge-window renormalization).
//
// Exposed as a C ABI consumed via ctypes (clip_embedder_tpu/native.py).
// Build: make -C native   (produces libclippre.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

inline double catmull_rom(double x) {
  x = std::fabs(x);
  const double a = -0.5;
  if (x <= 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

inline double bilinear(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

struct Weights {
  // For each output index: first source index + contiguous weights.
  std::vector<int> xmin;
  std::vector<int> count;
  std::vector<double> coeffs;  // stride = max_count
  int max_count = 0;
};

// Pillow-style coefficient precompute over a (possibly fractional) crop
// window [crop_start, crop_start + crop_size) of an axis of length in_size.
Weights precompute(int out_size, int in_size, double crop_start,
                   double crop_size, int filter /*0=bicubic,1=bilinear,2=nearest*/) {
  Weights w;
  w.xmin.resize(out_size);
  w.count.resize(out_size);
  double scale = crop_size / out_size;

  if (filter == 2) {  // nearest
    w.max_count = 1;
    w.coeffs.assign(static_cast<size_t>(out_size), 1.0);
    for (int i = 0; i < out_size; ++i) {
      int src = static_cast<int>(crop_start + (i + 0.5) * scale);
      src = std::min(std::max(src, 0), in_size - 1);
      w.xmin[i] = src;
      w.count[i] = 1;
    }
    return w;
  }

  double filterscale = std::max(scale, 1.0);
  double support = (filter == 0 ? 2.0 : 1.0) * filterscale;
  w.max_count = static_cast<int>(std::ceil(support)) * 2 + 1;
  w.coeffs.assign(static_cast<size_t>(out_size) * w.max_count, 0.0);

  for (int i = 0; i < out_size; ++i) {
    double center = crop_start + (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    double* k = &w.coeffs[static_cast<size_t>(i) * w.max_count];
    int n = xmax - xmin;
    for (int x = 0; x < n; ++x) {
      double v = (filter == 0 ? catmull_rom : bilinear)(
          (x + xmin - center + 0.5) / filterscale);
      k[x] = v;
      total += v;
    }
    if (total != 0.0) {
      for (int x = 0; x < n; ++x) k[x] /= total;
    }
    w.xmin[i] = xmin;
    w.count[i] = n;
  }
  return w;
}

void resize_one(const uint8_t* src, int src_h, int src_w,
                float* dst, int out_size,
                double crop_x, double crop_y, double crop_w, double crop_h,
                int filter, const float* mean, const float* std_,
                bool chw) {
  Weights wy = precompute(out_size, src_h, crop_y, crop_h, filter);
  Weights wx = precompute(out_size, src_w, crop_x, crop_w, filter);

  // Only the columns the horizontal pass will actually sample matter —
  // for a "shortest"-mode panorama that's the centered crop window, not
  // the full width. Bound them from the horizontal coefficient windows.
  int x_lo = src_w, x_hi = 0;
  for (int ox = 0; ox < out_size; ++ox) {
    x_lo = std::min(x_lo, wx.xmin[ox]);
    x_hi = std::max(x_hi, wx.xmin[ox] + wx.count[ox]);
  }
  if (x_lo >= x_hi) { x_lo = 0; x_hi = std::min(1, src_w); }
  const int win_w = x_hi - x_lo;

  // Pass 1: vertical — rows [out_size, win_w, 3] in double for accuracy.
  std::vector<double> tmp(static_cast<size_t>(out_size) * win_w * 3);
  for (int oy = 0; oy < out_size; ++oy) {
    const double* k = &wy.coeffs[static_cast<size_t>(oy) * wy.max_count];
    int ymin = wy.xmin[oy], n = wy.count[oy];
    double* row = &tmp[static_cast<size_t>(oy) * win_w * 3];
    std::memset(row, 0, sizeof(double) * win_w * 3);
    for (int t = 0; t < n; ++t) {
      const uint8_t* srow = src +
          (static_cast<size_t>(ymin + t) * src_w + x_lo) * 3;
      double coef = k[t];
      for (int x = 0; x < win_w * 3; ++x) row[x] += coef * srow[x];
    }
  }

  // Pass 2: horizontal + normalize + layout (indices shifted by x_lo).
  const double inv255 = 1.0 / 255.0;
  for (int oy = 0; oy < out_size; ++oy) {
    const double* row = &tmp[static_cast<size_t>(oy) * win_w * 3];
    for (int ox = 0; ox < out_size; ++ox) {
      const double* k = &wx.coeffs[static_cast<size_t>(ox) * wx.max_count];
      int xmin = wx.xmin[ox] - x_lo, n = wx.count[ox];
      double acc[3] = {0, 0, 0};
      for (int t = 0; t < n; ++t) {
        const double* px = row + static_cast<size_t>(xmin + t) * 3;
        double coef = k[t];
        acc[0] += coef * px[0];
        acc[1] += coef * px[1];
        acc[2] += coef * px[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = static_cast<float>((acc[c] * inv255 - mean[c]) / std_[c]);
        if (chw) {
          dst[(static_cast<size_t>(c) * out_size + oy) * out_size + ox] = v;
        } else {
          dst[(static_cast<size_t>(oy) * out_size + ox) * 3 + c] = v;
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Preprocess a batch of independently-sized images.
//   srcs:        array of pointers to H*W*3 u8 buffers
//   hs, ws:      per-image heights/widths
//   batch:       number of images
//   out:         batch * (3*out_size*out_size) floats
//   filter:      0 bicubic (CatmullRom), 1 bilinear, 2 nearest
//   resize_mode: 0 shortest (centered min-side square crop), 1 squash
//   chw:         1 → CHW layout (reference layout), 0 → HWC
//   n_threads:   worker threads over the batch (0 → hardware_concurrency)
void clip_preprocess_batch(const uint8_t** srcs, const int* hs, const int* ws,
                           int batch, float* out, int out_size,
                           const float* mean, const float* std_,
                           int filter, int resize_mode, int chw,
                           int n_threads) {
  size_t per = static_cast<size_t>(3) * out_size * out_size;
  auto work = [&](int i) {
    int h = hs[i], w = ws[i];
    if (h <= 0 || w <= 0) {  // guard empty dims: zero-fill the slot
      std::memset(out + per * i, 0, per * sizeof(float));
      return;
    }
    double cx = 0.0, cy = 0.0, cw = w, ch = h;
    if (resize_mode == 0) {
      double side = std::min(w, h);
      cx = (w - side) / 2.0;
      cy = (h - side) / 2.0;
      cw = ch = side;
    }
    resize_one(srcs[i], h, w, out + per * i, out_size, cx, cy, cw, ch,
               filter, mean, std_, chw != 0);
  };

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int threads = n_threads > 0 ? n_threads : (hw > 0 ? hw : 1);
  threads = std::min(threads, batch);
  if (threads <= 1) {
    for (int i = 0; i < batch; ++i) work(i);
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<int> next{0};
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < batch; i = next.fetch_add(1)) work(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
