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
#include <condition_variable>
#include <map>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

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

// ---------------------------------------------------------------------------
// Threaded prefetching data loader: worker threads run the fused
// normalize+quantize on raw uint8 batches while the TPU computes — the
// native data-pipeline stage a serving deployment needs (the reference has
// no loader; its input path is eager torch quantize, quantization.py:113-141).
//
// Semantics: FIFO (submission order preserved via sequence tags) with a
// bounded job queue for backpressure. Pure C++ threads — safe to block in
// via ctypes (the GIL is released during the call).

namespace {

struct RawJob {
  uint64_t seq;
  int n;
  std::vector<uint8_t> raw;
};

struct ReadyBatch {
  int n;
  std::vector<int8_t> data;
};

struct Loader {
  int h = 0, w = 0, c = 0;
  std::vector<float> mean, stdv;
  float act_scale = 1.0f;
  size_t capacity = 4;

  std::mutex mu;
  std::condition_variable cv_job, cv_ready, cv_space;
  std::queue<RawJob> jobs;
  std::map<uint64_t, ReadyBatch> ready;   // ordered by seq
  uint64_t next_submit = 0, next_emit = 0;
  bool stopping = false;
  std::vector<std::thread> workers;

  void work() {
    for (;;) {
      RawJob job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stopping || !jobs.empty(); });
        if (stopping && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop();
        cv_space.notify_all();
      }
      ReadyBatch out;
      out.n = job.n;
      out.data.resize((size_t)job.n * h * w * c);
      const float inv = 1.0f / act_scale;
      const int64_t pixels = (int64_t)job.n * h * w;
      for (int64_t i = 0; i < pixels; ++i) {
        const uint8_t* px = job.raw.data() + i * c;
        int8_t* po = out.data.data() + i * c;
        for (int ci = 0; ci < c; ++ci) {
          float v = ((float)px[ci] / 255.0f - mean[ci]) / stdv[ci];
          float q = nearbyintf(v * inv);
          q = q < -127.f ? -127.f : (q > 127.f ? 127.f : q);
          po[ci] = (int8_t)q;
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(job.seq, std::move(out));
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(int n_threads, int h, int w, int c,
                    const float* mean, const float* stdv,
                    float act_scale, int capacity) {
  auto* L = new Loader();
  L->h = h; L->w = w; L->c = c;
  L->mean.assign(mean, mean + c);
  L->stdv.assign(stdv, stdv + c);
  L->act_scale = act_scale;
  L->capacity = capacity > 0 ? (size_t)capacity : 4;
  if (n_threads < 1) n_threads = 1;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

// Enqueue n raw HWC uint8 images (copied); blocks when `capacity` jobs are
// already waiting (backpressure). Returns the job's sequence number, or -1
// if the loader is stopping (a submit racing destroy must not enqueue a
// job no worker will ever process — that would deadlock loader_next).
int64_t loader_submit(void* handle, const uint8_t* imgs, int n) {
  auto* L = (Loader*)handle;
  RawJob job;
  job.n = n;
  job.raw.assign(imgs, imgs + (size_t)n * L->h * L->w * L->c);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_space.wait(lk, [&] {
    return L->stopping || L->jobs.size() < L->capacity;
  });
  if (L->stopping) return -1;
  job.seq = L->next_submit++;
  const int64_t seq = (int64_t)job.seq;
  L->jobs.push(std::move(job));
  L->cv_job.notify_one();
  return seq;
}

// Blocking pop of the next batch IN SUBMISSION ORDER into `out`
// (caller-sized for the submitted n). Returns n, or -1 if the loader was
// stopped with nothing pending.
int loader_next(void* handle, int8_t* out) {
  auto* L = (Loader*)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [&] {
    return L->ready.count(L->next_emit) > 0 ||
           (L->stopping && L->next_emit >= L->next_submit);
  });
  auto it = L->ready.find(L->next_emit);
  if (it == L->ready.end()) return -1;
  ReadyBatch b = std::move(it->second);
  L->ready.erase(it);
  L->next_emit++;
  lk.unlock();
  std::memcpy(out, b.data.data(), b.data.size());
  return b.n;
}

// Batches submitted but not yet emitted.
int loader_pending(void* handle) {
  auto* L = (Loader*)handle;
  std::lock_guard<std::mutex> lk(L->mu);
  return (int)(L->next_submit - L->next_emit);
}

void loader_destroy(void* handle) {
  auto* L = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stopping = true;
  }
  L->cv_job.notify_all();
  L->cv_ready.notify_all();
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
