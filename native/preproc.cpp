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

// --- OpenCV uint8 fixed-point INTER_LINEAR resize ------------------------
//
// The float path above matches OpenCV's float semantics; OpenCV's *uint8*
// path is different arithmetic: 11-bit fixed-point coefficients
// (INTER_RESIZE_COEF_SCALE = 2048), int32 horizontal accumulation, and the
// 8u vertical specialization
//   dst = (((b0*(S0>>4)) >> 16) + ((b1*(S1>>4)) >> 16) + 2) >> 2.
// Replicating it bit-for-bit keeps decoded pixels identical whether this
// library loads or the cv2.resize fallback runs (ADVICE r1: ingest numerics
// must not be environment-dependent). Fuzz-proven bit-exact against
// cv2.resize (OpenCV 5.0) for all NON-ENLARGING resizes; OpenCV 5.0 changed
// the 8U upscale arithmetic, so callers route enlargements to cv2 itself
// (imageclust_tpu/data/native.py:native_decode_resize).

constexpr int kCoefBits = 11;
constexpr int kCoefScale = 1 << kCoefBits;  // 2048

// round-half-to-even, like OpenCV's cvRound
inline int cv_round(double v) {
  return static_cast<int>(std::nearbyint(v));
}

struct FixedTaps {
  std::vector<int> ofs;        // lo tap index (element units)
  std::vector<short> a0, a1;   // fixed-point weights of lo/hi taps
  int max2 = 0;                // dx < max2 -> two taps; else single tap
};

FixedTaps make_fixed_taps(int in_size, int out_size) {
  FixedTaps t;
  t.ofs.resize(out_size);
  t.a0.resize(out_size);
  t.a1.resize(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  t.max2 = out_size;
  for (int dx = 0; dx < out_size; ++dx) {
    // OpenCV narrows the source coordinate to float before splitting it
    // into (sx, fx) — replicate exactly or coefficients round differently.
    float fx = static_cast<float>((dx + 0.5) * scale - 0.5);
    int sx = static_cast<int>(std::floor(fx));
    fx -= sx;
    if (sx < 0) {
      sx = 0;
      fx = 0;
    }
    if (sx >= in_size - 1) {
      // single-tap region: clamp to the last pixel, full weight
      sx = in_size - 1;
      t.max2 = std::min(t.max2, dx);
      t.ofs[dx] = sx;
      t.a0[dx] = kCoefScale;
      t.a1[dx] = 0;
      continue;
    }
    t.ofs[dx] = sx;
    t.a0[dx] = static_cast<short>(cv_round((1.0f - fx) * kCoefScale));
    t.a1[dx] = static_cast<short>(cv_round(fx * kCoefScale));
  }
  return t;
}

// Horizontal pass for one source row: uint8 -> int32 (coef-scaled).
void hresize_fixed(const uint8_t* r, int channels, int out_w,
                   const FixedTaps& tx, int* out) {
  for (int ox = 0; ox < tx.max2; ++ox) {
    const int x0 = tx.ofs[ox] * channels;
    const int a0 = tx.a0[ox], a1 = tx.a1[ox];
    for (int c = 0; c < channels; ++c) {
      out[ox * channels + c] =
          r[x0 + c] * a0 + r[x0 + channels + c] * a1;
    }
  }
  for (int ox = tx.max2; ox < out_w; ++ox) {
    const int x0 = tx.ofs[ox] * channels;
    for (int c = 0; c < channels; ++c) {
      out[ox * channels + c] = r[x0 + c] * kCoefScale;
    }
  }
}

void resize_one_u8(const uint8_t* src, int in_h, int in_w, int channels,
                   uint8_t* dst, int out_h, int out_w, const FixedTaps& ty,
                   const FixedTaps& tx) {
  const int row_len = out_w * channels;
  std::vector<int> cache(2 * static_cast<size_t>(row_len));
  int cached_rows[2] = {-1, -1};

  auto load_row = [&](int sy, int slot) {
    hresize_fixed(src + static_cast<size_t>(sy) * in_w * channels, channels,
                  out_w, tx, cache.data() + static_cast<size_t>(slot) * row_len);
    cached_rows[slot] = sy;
  };

  for (int oy = 0; oy < out_h; ++oy) {
    const int y0 = ty.ofs[oy];
    const int y1 = std::min(y0 + 1, in_h - 1);
    const int b0 = ty.a0[oy], b1 = ty.a1[oy];
    if (cached_rows[0] != y0) {
      if (cached_rows[1] == y0) {
        std::swap(cached_rows[0], cached_rows[1]);
        for (int i = 0; i < row_len; ++i)
          std::swap(cache[i], cache[row_len + i]);
      } else {
        load_row(y0, 0);
      }
    }
    if (cached_rows[1] != y1) {
      if (y1 == y0) {
        cached_rows[1] = y1;
        std::memcpy(cache.data() + row_len, cache.data(),
                    sizeof(int) * row_len);
      } else {
        load_row(y1, 1);
      }
    }
    const int* S0 = cache.data();
    const int* S1 = cache.data() + row_len;
    uint8_t* out_row = dst + static_cast<size_t>(oy) * row_len;
    for (int i = 0; i < row_len; ++i) {
      out_row[i] = static_cast<uint8_t>(
          (((b0 * (S0[i] >> 4)) >> 16) + ((b1 * (S1[i] >> 4)) >> 16) + 2) >>
          2);
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

// Resize a batch of same-shaped HWC uint8 images to (out_h, out_w) uint8,
// bit-exact with cv2.resize(..., INTER_LINEAR) on uint8 input.
void ic_resize_batch_u8(const uint8_t* src, int n, int in_h, int in_w,
                        int channels, uint8_t* dst, int out_h, int out_w,
                        int threads) {
  const FixedTaps ty = make_fixed_taps(in_h, out_h);
  const FixedTaps tx = make_fixed_taps(in_w, out_w);
  const size_t in_stride = static_cast<size_t>(in_h) * in_w * channels;
  const size_t out_stride = static_cast<size_t>(out_h) * out_w * channels;
  parallel_for(n, threads, [&](int i) {
    resize_one_u8(src + i * in_stride, in_h, in_w, channels,
                  dst + i * out_stride, out_h, out_w, ty, tx);
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

// Cluster-member reconstruction for the bucketed Ward engine
// (imageclust_tpu/cluster/sharded.py): expand each bucket's merge log into
// ordered member lists. The Python/dict walk was the largest host cost at
// the 10M-image tier (~85 s); this is the same computation as linked-list
// concatenation, one pass over the log plus one pass over the members.
//
// Per bucket b: counts[b] leaf items (local stamps 0..c-1), merge rows
// logs[log_off[b]..log_off[b+1]) of (hi, lo, new) LOCAL stamps with
// new == c + row (the device loop assigns internal births sequentially),
// and the bucket's surviving root stamps roots[root_off[b]..root_off[b+1]).
// Every leaf belongs to exactly one surviving root, so bucket b's members
// occupy exactly counts[b] slots of out_members, at offset counts_off[b]
// (the caller's prefix sum). Member order matches ward._leaf_indices /
// MergeClusters append order (clustering.go:29-47): hi-list then lo-list.
// out_sizes gets each root's member count, in (bucket, given-root) order.
// Returns 0, or -1 on a malformed log (stamp out of range).
int ic_reconstruct_members(const int32_t* logs, const int64_t* log_off,
                           const int32_t* counts, const int64_t* counts_off,
                           const int32_t* roots, const int64_t* root_off,
                           int nb, int32_t* out_members, int32_t* out_sizes,
                           int threads) {
  std::atomic<int> rc{0};
  parallel_for(nb, threads, [&](int b) {
    const int c = counts[b];
    const int m = static_cast<int>(log_off[b + 1] - log_off[b]);
    const int total = c + m;
    if (c == 0) return;
    // head/tail hold LEAF stamps; nxt chains leaves. Internal stamp c+r is
    // the list formed by merge row r.
    std::vector<int32_t> head(total), tail(total), nxt(c, -1);
    for (int i = 0; i < c; ++i) head[i] = tail[i] = i;
    const int32_t* lg = logs + 3 * log_off[b];
    for (int r = 0; r < m; ++r) {
      const int32_t hi = lg[3 * r], lo = lg[3 * r + 1];
      if (hi < 0 || hi >= c + r || lo < 0 || lo >= c + r) {
        rc.store(-1);
        return;
      }
      nxt[tail[hi]] = head[lo];
      head[c + r] = head[hi];
      tail[c + r] = tail[lo];
    }
    int32_t* out = out_members + counts_off[b];
    int emitted = 0;
    for (int64_t ri = root_off[b]; ri < root_off[b + 1]; ++ri) {
      const int32_t root = roots[ri];
      if (root < 0 || root >= total) {
        rc.store(-1);
        return;
      }
      int n_mem = 0;
      for (int32_t leaf = head[root]; leaf >= 0; leaf = nxt[leaf]) {
        if (emitted + n_mem >= c) {  // cycle guard: malformed log
          rc.store(-1);
          return;
        }
        out[emitted + n_mem] = leaf;
        ++n_mem;
      }
      out_sizes[ri] = n_mem;
      emitted += n_mem;
    }
  });
  return rc.load();
}

// Sequential spill placement at C speed — the capacity-repair hot loop of
// cluster/sharded.py:_repair_buckets. For each item i in order: the first
// preference != src[i] with cnt < capacity wins; otherwise a monotone
// cursor scans for the first bucket with room (buckets only FILL during
// this phase, so the cursor never moves backwards); if the cursor
// exhausts, the item stays in src[i]. cnt and cursor update in place so a
// later call continues the same scan. Single-threaded by design: each
// placement depends on every earlier one, and the Python chunked-bulk
// path this replaces degraded to per-item interpretation exactly when
// preferences contend (measured ~10 s per 1.4M contended items; this
// loop is ~10 ms).
void ic_spill_place(const int32_t* prefs, const int32_t* src, int64_t m,
                    int32_t p, int64_t* cnt, int64_t nb, int64_t capacity,
                    int64_t* cursor_io, int32_t* out) {
  int64_t cursor = *cursor_io;
  for (int64_t i = 0; i < m; ++i) {
    const int32_t b = src[i];
    const int32_t* pr = prefs + i * p;
    int32_t chosen = -1;
    for (int32_t j = 0; j < p; ++j) {
      const int32_t nbk = pr[j];
      if (nbk != b && cnt[nbk] < capacity) {
        chosen = nbk;
        break;
      }
    }
    if (chosen < 0) {
      while (cursor < nb && cnt[cursor] >= capacity) ++cursor;
      chosen = cursor < nb ? static_cast<int32_t>(cursor) : b;
    }
    ++cnt[chosen];
    out[i] = chosen;
  }
  *cursor_io = cursor;
}

int ic_version() { return 4; }

}  // extern "C"
