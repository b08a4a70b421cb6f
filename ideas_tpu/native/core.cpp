// ideas_tpu native host runtime: batched image preprocessing and the
// message<->tensor codec, C++ with a plain C ABI (loaded via ctypes).
//
// Role: the reference delegates its host-side per-image work to the
// torch DataLoader's C++ workers; this library is the TPU rebuild's
// equivalent — the hot per-batch host loops (uint8 -> [-1,1] float
// normalize + horizontal flip + layout copy, and the steganographic bit
// codec of /root/reference/utils.py:74-97) run in native code with
// thread-level parallelism, keeping the single-host-core Python loop off
// the critical path.
//
// Build: make -C ideas_tpu/native   (produces libideas_native.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Split [0, n) across hardware threads and run fn(begin, end).
template <typename F>
void parallel_for(int64_t n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = hw ? static_cast<int64_t>(hw) : 1;
  if (nthreads > n) nthreads = n > 0 ? n : 1;
  if (nthreads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min(n, b + chunk);
    if (b >= e) break;
    threads.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

// xoshiro256** PRNG for codec jitter.
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    uint64_t z = seed + 0x9E3779B97F4A7C15ULL;
    for (int i = 0; i < 4; ++i) {
      z += 0x9E3779B97F4A7C15ULL;
      uint64_t x = z;
      x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
      x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
      s[i] = x ^ (x >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t r = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return r;
  }
  // uniform in [0, 1)
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
};

}  // namespace

extern "C" {

// uint8 NHWC batch -> float32 in [-1, 1]; flips[i] != 0 mirrors sample i
// horizontally. in: (n, h, w, c) uint8, out: same shape float32.
void ideas_preprocess_batch(const uint8_t* in, float* out, int64_t n,
                            int64_t h, int64_t w, int64_t c,
                            const uint8_t* flips) {
  const int64_t img = h * w * c;
  parallel_for(n, [=](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      const uint8_t* src = in + b * img;
      float* dst = out + b * img;
      // IEEE division keeps the endpoints exact (255/127.5 == 2.0);
      // a reciprocal-multiply constant would leak 1.0000001 past the
      // [-1, 1] contract.
      if (flips && flips[b]) {
        for (int64_t y = 0; y < h; ++y) {
          for (int64_t x = 0; x < w; ++x) {
            const uint8_t* sp = src + (y * w + (w - 1 - x)) * c;
            float* dp = dst + (y * w + x) * c;
            for (int64_t k = 0; k < c; ++k)
              dp[k] = sp[k] / 127.5f - 1.0f;
          }
        }
      } else {
        for (int64_t i = 0; i < img; ++i)
          dst[i] = src[i] / 127.5f - 1.0f;
      }
    }
  });
}

// message bits (b, length) in {0,1} floats -> secret tensor
// (b, length/sigma): step*(m+0.5)-1 + U(-delta*step, delta*step).
// Semantics of /root/reference/utils.py:74-83.
void ideas_message_to_tensor(const float* msg, float* out, int64_t b,
                             int64_t length, int64_t sigma, double delta,
                             uint64_t seed) {
  const int64_t groups = length / sigma;
  const double step = 2.0 / static_cast<double>(1ULL << sigma);
  parallel_for(b, [=](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; ++r) {
      Rng rng(seed ^ (0xA076'1D64'78BD'642FULL * (r + 1)));
      const float* row = msg + r * length;
      float* orow = out + r * groups;
      for (int64_t g = 0; g < groups; ++g) {
        int64_t m = 0;
        for (int64_t i = 0; i < sigma; ++i)
          m = (m << 1) | (row[g * sigma + i] > 0.5f ? 1 : 0);
        double v = step * (m + 0.5) - 1.0;
        if (delta > 0) v += (rng.uniform() * 2.0 - 1.0) * step * delta;
        orow[g] = static_cast<float>(v);
      }
    }
  });
}

// secret tensor (b, groups) -> message bits (b, groups*sigma), MSB first.
// Semantics of /root/reference/utils.py:86-97.
void ideas_tensor_to_message(const float* tensor, float* out, int64_t b,
                             int64_t groups, int64_t sigma) {
  const double step = 2.0 / static_cast<double>(1ULL << sigma);
  parallel_for(b, [=](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; ++r) {
      const float* row = tensor + r * groups;
      float* orow = out + r * groups * sigma;
      for (int64_t g = 0; g < groups; ++g) {
        double v = row[g];
        if (v < -1.0) v = -1.0;
        if (v > 1.0) v = 1.0;
        double nums = (v + 1.0) / step;
        for (int64_t i = 0; i < sigma; ++i) {
          double power = static_cast<double>(1ULL << (sigma - i - 1));
          float bit = nums >= power ? 1.0f : 0.0f;
          orow[g * sigma + i] = bit;
          nums -= bit * power;
        }
      }
    }
  });
}

// Simple self-test hook.
int ideas_native_abi_version() { return 1; }

}  // extern "C"
