// Native batch assembler for the windowed training dataset.
//
// The reference's input pipeline runs inside torch's native DataLoader
// workers; this is the framework's native equivalent: multi-threaded window
// gather + NCHW->NHWC(frame-major) transpose from the in-RAM [T, C, H, W]
// cache (or a memory-mapped raw file) into device-ready
// [N, H, W, window*C] float32 batches, bypassing the Python GIL.
//
// C ABI, consumed via ctypes (climate2weather_tpu/data/native_loader.py).
// Build: g++ -O3 -march=native -shared -fPIC -pthread loader.cc -o libc2wloader.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Assemble one item: window starting at frame `start` of data [T, C, H, W]
// into out [H, W, window*C] with frame-major channel order.
void assemble_item(const float* data, int64_t C, int64_t H, int64_t W,
                   int64_t window, int64_t start, float* out) {
  const int64_t plane = H * W;
  const int64_t frame = C * plane;
  const int64_t wc = window * C;
  // Blocked over rows: for each row h, write out[h, w, f*C + c].
  for (int64_t h = 0; h < H; ++h) {
    float* orow = out + h * W * wc;
    for (int64_t f = 0; f < window; ++f) {
      const float* fbase = data + (start + f) * frame + h * W;
      for (int64_t c = 0; c < C; ++c) {
        const float* src = fbase + c * plane;  // [W] contiguous
        float* dst = orow + f * C + c;         // stride wc
        for (int64_t w = 0; w < W; ++w) {
          dst[w * wc] = src[w];
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Assemble a batch of n windows in parallel.
//   data:    [T, C, H, W] float32 base pointer
//   indices: [n] window start frames
//   out:     [n, H, W, window*C] float32 (caller-allocated)
void c2w_assemble_batch(const float* data, int64_t T, int64_t C, int64_t H,
                        int64_t W, const int64_t* indices, int64_t n,
                        int64_t window, float* out, int64_t num_threads) {
  (void)T;
  const int64_t item = H * W * window * C;
  if (num_threads <= 1 || n == 1) {
    for (int64_t i = 0; i < n; ++i) {
      assemble_item(data, C, H, W, window, indices[i], out + i * item);
    }
    return;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      assemble_item(data, C, H, W, window, indices[i], out + i * item);
    }
  };
  std::vector<std::thread> threads;
  const int64_t t = std::min<int64_t>(num_threads, n);
  threads.reserve(t);
  for (int64_t k = 0; k < t; ++k) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Flat copy helper (raw-cache ingestion): parallel memcpy of nbytes.
void c2w_parallel_copy(const char* src, char* dst, int64_t nbytes,
                       int64_t num_threads) {
  if (num_threads <= 1) {
    std::memcpy(dst, src, static_cast<size_t>(nbytes));
    return;
  }
  const int64_t chunk = (nbytes + num_threads - 1) / num_threads;
  std::vector<std::thread> threads;
  for (int64_t k = 0; k < num_threads; ++k) {
    const int64_t off = k * chunk;
    if (off >= nbytes) break;
    const int64_t len = std::min(chunk, nbytes - off);
    threads.emplace_back(
        [=]() { std::memcpy(dst + off, src + off, static_cast<size_t>(len)); });
  }
  for (auto& th : threads) th.join();
}

int64_t c2w_abi_version() { return 1; }

}  // extern "C"
