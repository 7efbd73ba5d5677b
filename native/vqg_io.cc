// vqg_io — native host-side data-path kernels for blt_vqg_tpu.
//
// The reference leans on HDF5's C library + PIL's C codecs through Python
// worker processes (reference utils/data_loader.py, utils/store_dataset.py).
// Here the runtime ingestion path is native in-repo: multi-threaded row
// gather out of memory-mapped arrays into a contiguous batch buffer, and
// batched int32 token surgery (drop-first-token + insert-at-1), both called
// from Python via ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i] = src[indices[i]] for i in [0, n).  row_bytes is the
// byte size of one row.  Threaded over rows; each thread does contiguous
// memcpy chunks, saturating DRAM bandwidth.
void vqg_gather_rows(const uint8_t* src, int64_t row_bytes,
                     const int64_t* indices, int64_t n,
                     uint8_t* dst, int32_t num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int32_t>(
        std::min<int64_t>(n, std::thread::hardware_concurrency()));
    if (num_threads <= 0) num_threads = 1;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    constexpr int64_t kChunk = 8;
    while (true) {
      int64_t start = next.fetch_add(kChunk);
      if (start >= n) break;
      int64_t end = std::min(start + kChunk, n);
      for (int64_t i = start; i < end; ++i) {
        std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes,
                    static_cast<size_t>(row_bytes));
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int32_t t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// uint8 -> float32 conversion with optional scale (e.g. 1/255), threaded.
void vqg_u8_to_f32(const uint8_t* src, float* dst, int64_t count,
                   float scale, int32_t num_threads) {
  if (num_threads <= 0) {
    num_threads = std::thread::hardware_concurrency();
    if (num_threads <= 0) num_threads = 1;
  }
  int64_t per = (count + num_threads - 1) / num_threads;
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < num_threads; ++t) {
    int64_t lo = t * per;
    int64_t hi = std::min(lo + per, count);
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i)
        dst[i] = static_cast<float>(src[i]) * scale;
    });
  }
  for (auto& t : threads) t.join();
}

// Token surgery, batched (reference data_loader.py:62-116 semantics):
// for each row: remove the first occurrence of `drop_id` (shifting left,
// appending pad_id), then insert insert_vals[i] at index 1.
// rows: [n, t_in] int32, out: [n, t_in + 1] int32.
void vqg_token_surgery(const int32_t* rows, int64_t n, int64_t t_in,
                       int32_t drop_id, int32_t pad_id,
                       const int32_t* insert_vals, int32_t* out) {
  const int64_t t_out = t_in + 1;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* r = rows + i * t_in;
    // drop first occurrence of drop_id into a scratch view
    int32_t tmp[512];  // t_in <= 511 always (questions are <= 21 tokens)
    int64_t w = 0;
    bool dropped = false;
    for (int64_t j = 0; j < t_in; ++j) {
      if (!dropped && r[j] == drop_id) { dropped = true; continue; }
      tmp[w++] = r[j];
    }
    while (w < t_in) tmp[w++] = pad_id;
    // insert at index 1
    int32_t* o = out + i * t_out;
    o[0] = tmp[0];
    o[1] = insert_vals[i];
    std::memcpy(o + 2, tmp + 1, static_cast<size_t>(t_in - 1) * 4);
  }
}

// Posterior construction fused: question -> copy, [0] = pos_id, drop first
// end_id, append pad, insert insert_vals at 1.  rows [n, t] -> out [n, t+1].
void vqg_make_posterior(const int32_t* questions, int64_t n, int64_t t_in,
                        int32_t pos_id, int32_t end_id, int32_t pad_id,
                        const int32_t* insert_vals, int32_t* out) {
  std::vector<int32_t> scratch(static_cast<size_t>(n) * t_in);
  for (int64_t i = 0; i < n; ++i) {
    int32_t* s = scratch.data() + i * t_in;
    std::memcpy(s, questions + i * t_in, static_cast<size_t>(t_in) * 4);
    s[0] = pos_id;
  }
  vqg_token_surgery(scratch.data(), n, t_in, end_id, pad_id, insert_vals,
                    out);
}

}  // extern "C"
