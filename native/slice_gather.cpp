// Native host-side batch assembly for the TPU device feed.
//
// Role in the framework: the reference's hot host path was torch
// DataLoader workers doing per-slice python/torch ops (clamp, scale,
// stack) — measured as the pipeline bottleneck (33.0s of every 33.3s
// window; see BASELINE.md).  This is the native equivalent of the
// reference's native layer for the data path: one multithreaded
// gather+normalize over the RAM-resident (N, H, W) float32 slice stacks,
// producing a ready-to-device_put batch.
//
// Exposed via ctypes (no pybind11 in this image).  Build: native/build.sh
// (cmake or direct g++).  Python wrapper with numpy fallback:
// mudiff_tpu/data/_native.py.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float clamp3(float v) {
  // z-score -> [-1, 1]: clamp to +-3 sigma and divide by 3
  // (reference dataset/dataset_brats.py:83).
  return std::max(-3.0f, std::min(3.0f, v)) / 3.0f;
}

void worker(const float* src, const int64_t* indices, int64_t begin,
            int64_t end, int64_t hw, float* dst) {
  for (int64_t i = begin; i < end; ++i) {
    const float* s = src + indices[i] * hw;
    float* d = dst + i * hw;
    for (int64_t j = 0; j < hw; ++j) d[j] = clamp3(s[j]);
  }
}

}  // namespace

extern "C" {

// Gather `n_idx` slices of `hw` floats each from `src` (stack of N
// slices) into `dst`, applying the clamp(+-3)/3 normalization.
// `n_threads <= 0` means hardware concurrency.
void mudiff_gather_normalize(const float* src, const int64_t* indices,
                             int64_t n_idx, int64_t hw, float* dst,
                             int32_t n_threads) {
  if (n_idx <= 0 || hw <= 0) return;
  int64_t threads = n_threads > 0
                        ? n_threads
                        : static_cast<int64_t>(
                              std::max(1u, std::thread::hardware_concurrency()));
  threads = std::min<int64_t>(threads, n_idx);
  if (threads <= 1) {
    worker(src, indices, 0, n_idx, hw, dst);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  int64_t chunk = (n_idx + threads - 1) / threads;
  for (int64_t t = 0; t < threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min(n_idx, begin + chunk);
    if (begin >= end) break;
    pool.emplace_back(worker, src, indices, begin, end, hw, dst);
  }
  for (auto& th : pool) th.join();
}

// Same, gathering all four modalities in one call (one pass over the
// batch, four destination buffers) — amortizes thread launch and keeps
// the four gathers cache-friendly per slice index.
void mudiff_gather_normalize4(const float* src0, const float* src1,
                              const float* src2, const float* src3,
                              const int64_t* indices, int64_t n_idx,
                              int64_t hw, float* dst0, float* dst1,
                              float* dst2, float* dst3,
                              int32_t n_threads) {
  const float* srcs[4] = {src0, src1, src2, src3};
  float* dsts[4] = {dst0, dst1, dst2, dst3};
  int64_t threads = n_threads > 0
                        ? n_threads
                        : static_cast<int64_t>(
                              std::max(1u, std::thread::hardware_concurrency()));
  threads = std::min<int64_t>(threads, n_idx);
  auto run = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      for (int m = 0; m < 4; ++m) {
        const float* s = srcs[m] + indices[i] * hw;
        float* d = dsts[m] + i * hw;
        for (int64_t j = 0; j < hw; ++j) d[j] = clamp3(s[j]);
      }
    }
  };
  if (threads <= 1) {
    run(0, n_idx);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n_idx + threads - 1) / threads;
  for (int64_t t = 0; t < threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min(n_idx, begin + chunk);
    if (begin >= end) break;
    pool.emplace_back(run, begin, end);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
