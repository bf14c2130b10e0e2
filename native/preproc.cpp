// Native host-side preprocessing runtime.
//
// Counterpart of the reference's native layer: the reference reaches OpenCV
// C++ through cgo for IMRead/Resize/CvtColor/BlobFromImage
// (internal/gocv/flags.go, internal/embeddings/embeddings.go:46-116), one
// image at a time. This library does the host-side share of that work —
// bilinear resize, BGR->RGB, scale/mean/std normalization into a CHW float
// blob — batched and multithreaded, with OpenCV INTER_LINEAR sampling
// semantics (half-pixel centers, border replicate). Exposed over a plain C
// ABI consumed via ctypes (no pybind11 in this image).
//
// The TPU path normally preprocesses on device
// (imageclust_tpu/ops/preprocess.py); this runtime serves hosts that must
// ship ready blobs (e.g. CPU-only frontends feeding a remote TPU service)
// and the content-addressed label/embedding caches.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Taps {
  std::vector<int> lo, hi;
  std::vector<float> w_hi;  // weight of the hi tap; lo gets (1 - w_hi)
};

// OpenCV INTER_LINEAR coordinate mapping: src = (dst + 0.5) * scale - 0.5,
// taps clamped to the edge (border replicate).
Taps make_taps(int in_size, int out_size) {
  Taps t;
  t.lo.resize(out_size);
  t.hi.resize(out_size);
  t.w_hi.resize(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  for (int i = 0; i < out_size; ++i) {
    double src = (i + 0.5) * scale - 0.5;
    double fl = std::floor(src);
    int x0 = static_cast<int>(fl);
    float frac = static_cast<float>(src - fl);
    t.lo[i] = std::clamp(x0, 0, in_size - 1);
    t.hi[i] = std::clamp(x0 + 1, 0, in_size - 1);
    t.w_hi[i] = frac;
  }
  return t;
}

// Resize one interleaved HWC uint8 image to out x out float32 HWC.
// Separable two-pass: horizontal taps are applied once per SOURCE row into a
// cache (each source row is consumed by ~2 output rows), then the vertical
// pass blends two cached rows — ~2x less interpolation work than the naive
// per-output-pixel form and a contiguous inner loop the compiler vectorizes.
void resize_one(const uint8_t* src, int in_h, int in_w, int channels,
                float* dst, int out_h, int out_w, const Taps& ty,
                const Taps& tx) {
  const int row_len = out_w * channels;
  std::vector<float> cache(2 * static_cast<size_t>(row_len));
  int cached_rows[2] = {-1, -1};

  auto hresize = [&](int sy, int slot) {
    const uint8_t* r = src + static_cast<size_t>(sy) * in_w * channels;
    float* out = cache.data() + static_cast<size_t>(slot) * row_len;
    for (int ox = 0; ox < out_w; ++ox) {
      const int x0 = tx.lo[ox] * channels;
      const int x1 = tx.hi[ox] * channels;
      const float wx = tx.w_hi[ox];
      for (int c = 0; c < channels; ++c) {
        out[ox * channels + c] = r[x0 + c] + (r[x1 + c] - r[x0 + c]) * wx;
      }
    }
    cached_rows[slot] = sy;
  };

  for (int oy = 0; oy < out_h; ++oy) {
    const int y0 = ty.lo[oy], y1 = ty.hi[oy];
    // source rows are visited in nondecreasing order; reuse cached slots
    if (cached_rows[0] != y0) {
      if (cached_rows[1] == y0) {
        std::swap(cached_rows[0], cached_rows[1]);
        for (int i = 0; i < row_len; ++i)
          std::swap(cache[i], cache[row_len + i]);
      } else {
        hresize(y0, 0);
      }
    }
    if (cached_rows[1] != y1) {
      if (y1 == y0) {
        cached_rows[1] = y1;
        std::memcpy(cache.data() + row_len, cache.data(),
                    sizeof(float) * row_len);
      } else {
        hresize(y1, 1);
      }
    }
    const float wy = ty.w_hi[oy];
    const float* a = cache.data();
    const float* b = cache.data() + row_len;
    float* out_row = dst + static_cast<size_t>(oy) * row_len;
    for (int i = 0; i < row_len; ++i) {
      out_row[i] = a[i] + (b[i] - a[i]) * wy;
    }
  }
}

void parallel_for(int n, int threads, const std::function<void(int)>& fn) {
  if (threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  std::vector<std::thread> pool;
  const int k = std::min(threads, n);
  pool.reserve(k);
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Resize a batch of same-shaped HWC uint8 images to (out_h, out_w),
// writing float32 HWC. dst must hold n * out_h * out_w * channels floats.
void ic_resize_batch_f32(const uint8_t* src, int n, int in_h, int in_w,
                         int channels, float* dst, int out_h, int out_w,
                         int threads) {
  const Taps ty = make_taps(in_h, out_h);
  const Taps tx = make_taps(in_w, out_w);
  const size_t in_stride = static_cast<size_t>(in_h) * in_w * channels;
  const size_t out_stride = static_cast<size_t>(out_h) * out_w * channels;
  parallel_for(n, threads, [&](int i) {
    resize_one(src + i * in_stride, in_h, in_w, channels,
               dst + i * out_stride, out_h, out_w, ty, tx);
  });
}

// Full blob preprocess, parity with BlobFromImage semantics
// (embeddings.go:96): resize -> optional BGR->RGB -> x*scale, minus mean,
// over std -> CHW float32. dst holds n * channels * out * out floats.
void ic_preprocess_blob(const uint8_t* src, int n, int in_h, int in_w,
                        float* dst, int out, float scale, const float* mean,
                        const float* stddev, int bgr_to_rgb, int threads) {
  const int channels = 3;
  const Taps ty = make_taps(in_h, out);
  const Taps tx = make_taps(in_w, out);
  const size_t in_stride = static_cast<size_t>(in_h) * in_w * channels;
  const size_t plane = static_cast<size_t>(out) * out;
  const size_t out_stride = plane * channels;
  parallel_for(n, threads, [&](int i) {
    std::vector<float> hwc(out_stride);
    resize_one(src + i * in_stride, in_h, in_w, channels, hwc.data(), out,
               out, ty, tx);
    float* base = dst + i * out_stride;
    for (int c = 0; c < channels; ++c) {
      const int src_c = bgr_to_rgb ? (channels - 1 - c) : c;
      const float m = mean[c];
      const float inv = 1.0f / stddev[c];
      float* planep = base + c * plane;
      for (size_t p = 0; p < plane; ++p) {
        planep[p] = (hwc[p * channels + src_c] * scale - m) * inv;
      }
    }
  });
}

// FNV-1a 64-bit content hash — key for the content-addressed caches
// (replaces the reference's collision-prone filename keys,
// rekognition.go:127-131).
uint64_t ic_content_hash(const uint8_t* data, uint64_t len) {
  uint64_t h = 1469598103934665603ULL;
  for (uint64_t i = 0; i < len; ++i) {
    h ^= data[i];
    h *= 1099511628211ULL;
  }
  return h;
}

int ic_version() { return 1; }

}  // extern "C"
