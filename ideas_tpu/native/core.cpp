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
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

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

}  // extern "C"

// ---------------------------------------------------------------------------
// Read-only LMDB environment reader (the native counterpart of
// ideas_tpu/data/lmdb_reader.py; format per http://www.lmdb.tech/doc/,
// 64-bit little-endian layout). Role: the reference reads LSUN stores
// through the lmdb C library's Python binding (/root/reference/dataset.py);
// here the mmap + B+tree walk lives in this runtime so per-item fetches
// cost no Python bytecode on the data path.

namespace {

constexpr uint32_t kMdbMagic = 0xBEEFC0DE;
constexpr uint16_t kPBranch = 0x01;
constexpr uint16_t kPLeaf = 0x02;
constexpr uint16_t kFBigdata = 0x01;
constexpr uint64_t kPInvalid = ~0ULL;

template <typename T>
T rd(const uint8_t* p) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  return v;
}

struct LmdbEnv {
  const uint8_t* map = nullptr;
  size_t size = 0;
  uint32_t psize = 0;
  uint64_t root = kPInvalid;
  uint64_t entries = 0;

  // Parse one meta page; returns txnid or 0 on bad magic.
  uint64_t parse_meta(size_t off0, uint32_t* ps, uint64_t* rt, uint64_t* en) const {
    const uint8_t* base = map + off0 + 16;
    if (rd<uint32_t>(base) != kMdbMagic) return 0;
    *ps = rd<uint32_t>(base + 24);
    const uint8_t* main_db = base + 24 + 48;
    *en = rd<uint64_t>(main_db + 32);
    *rt = rd<uint64_t>(main_db + 40);
    return rd<uint64_t>(base + 24 + 96 + 8) + 1;  // +1 so txnid 0 is valid
  }

  bool open(const char* path) {
    std::string p(path);
    struct stat st;
    if (stat(p.c_str(), &st) == 0 && S_ISDIR(st.st_mode)) p += "/data.mdb";
    int fd = ::open(p.c_str(), O_RDONLY);
    if (fd < 0) return false;
    if (fstat(fd, &st) != 0) { ::close(fd); return false; }
    size = static_cast<size_t>(st.st_size);
    void* m = mmap(nullptr, size, PROT_READ, MAP_SHARED, fd, 0);
    ::close(fd);  // mapping persists
    if (m == MAP_FAILED) return false;
    map = static_cast<const uint8_t*>(m);
    uint32_t ps0 = 0, ps1 = 0;
    uint64_t rt0 = 0, rt1 = 0, en0 = 0, en1 = 0;
    uint64_t t0 = parse_meta(0, &ps0, &rt0, &en0);
    // Meta page 1 lives at one page-size offset. liblmdb tolerates one
    // torn/corrupt meta by falling back to the other; match that: when
    // meta 0 is valid its recorded page size locates meta 1, otherwise
    // probe the OS page size and the common LMDB page sizes (the page
    // size at creation is the creating host's OS page size).
    uint64_t t1 = 0;
    if (t0) {
      if (ps0 && ps0 + 256 <= size) t1 = parse_meta(ps0, &ps1, &rt1, &en1);
    } else {
      size_t cand[] = {(size_t)sysconf(_SC_PAGESIZE), 4096, 8192, 16384, 65536};
      for (size_t off : cand) {
        if (off == 0 || off + 256 > size) continue;
        t1 = parse_meta(off, &ps1, &rt1, &en1);
        if (t1) break;
      }
    }
    if (!t0 && !t1) { munmap(m, size); map = nullptr; return false; }
    if (t1 > t0) { psize = ps1; root = rt1; entries = en1; }
    else { psize = ps0; root = rt0; entries = en0; }
    return true;
  }

  void close() {
    if (map) munmap(const_cast<uint8_t*>(map), size);
    map = nullptr;
  }

  const uint8_t* page(uint64_t pgno) const { return map + pgno * psize; }

  // node i of a page; returns node offset pointer
  const uint8_t* node(const uint8_t* pg, int i) const {
    uint16_t ptr = rd<uint16_t>(pg + 16 + 2 * i);
    return pg + ptr;
  }

  static int num_keys(const uint8_t* pg) {
    return (rd<uint16_t>(pg + 12) - 16) / 2;
  }
  static uint16_t flags_of(const uint8_t* pg) { return rd<uint16_t>(pg + 10); }

  static uint64_t child_pgno(const uint8_t* n) {
    // branch nodes overlap lo/hi/flags with a 48-bit page number
    return static_cast<uint64_t>(rd<uint16_t>(n)) |
           (static_cast<uint64_t>(rd<uint16_t>(n + 2)) << 16) |
           (static_cast<uint64_t>(rd<uint16_t>(n + 4)) << 32);
  }

  // leaf node accessors
  static uint32_t datasize_of(const uint8_t* n) {
    return static_cast<uint32_t>(rd<uint16_t>(n)) |
           (static_cast<uint32_t>(rd<uint16_t>(n + 2)) << 16);
  }
  static uint16_t nflags_of(const uint8_t* n) { return rd<uint16_t>(n + 4); }
  static uint16_t ksize_of(const uint8_t* n) { return rd<uint16_t>(n + 6); }
  static const uint8_t* key_of(const uint8_t* n) { return n + 8; }

  const uint8_t* leaf_value(const uint8_t* n, uint32_t* dsize) const {
    *dsize = datasize_of(n);
    if (nflags_of(n) & kFBigdata) {
      uint64_t ovpg = rd<uint64_t>(n + 8 + ksize_of(n));
      return page(ovpg) + 16;
    }
    return n + 8 + ksize_of(n);
  }

  // in-order key walk; fn(key_ptr, ksize)
  template <typename F>
  void walk_keys(uint64_t pgno, F&& fn) const {
    const uint8_t* pg = page(pgno);
    int n = num_keys(pg);
    uint16_t fl = flags_of(pg);
    if (fl & kPLeaf) {
      for (int i = 0; i < n; ++i) {
        const uint8_t* nd = node(pg, i);
        fn(key_of(nd), ksize_of(nd));
      }
    } else if (fl & kPBranch) {
      for (int i = 0; i < n; ++i) walk_keys(child_pgno(node(pg, i)), fn);
    }
  }
};

int key_cmp(const uint8_t* a, int alen, const uint8_t* b, int blen) {
  int r = std::memcmp(a, b, std::min(alen, blen));
  return r ? r : (alen - blen);
}

}  // namespace

extern "C" {

void* ideas_lmdb_open(const char* path) {
  auto* env = new LmdbEnv();
  if (!env->open(path)) { delete env; return nullptr; }
  return env;
}

void ideas_lmdb_close(void* h) {
  auto* env = static_cast<LmdbEnv*>(h);
  env->close();
  delete env;
}

int64_t ideas_lmdb_entries(void* h) {
  return static_cast<int64_t>(static_cast<LmdbEnv*>(h)->entries);
}

// Point lookup. Returns the value size, or -1 if the key is absent.
// Copies min(size, bufcap) bytes into buf when buf != nullptr.
int64_t ideas_lmdb_get(void* h, const uint8_t* key, int64_t klen,
                       uint8_t* buf, int64_t bufcap) {
  const auto* env = static_cast<LmdbEnv*>(h);
  if (env->root == kPInvalid) return -1;
  uint64_t pgno = env->root;
  for (;;) {
    const uint8_t* pg = env->page(pgno);
    int n = LmdbEnv::num_keys(pg);
    uint16_t fl = LmdbEnv::flags_of(pg);
    if (fl & kPLeaf) {
      int lo = 0, hi = n - 1;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const uint8_t* nd = env->node(pg, mid);
        int c = key_cmp(LmdbEnv::key_of(nd), LmdbEnv::ksize_of(nd),
                        key, static_cast<int>(klen));
        if (c == 0) {
          uint32_t dsize;
          const uint8_t* v = env->leaf_value(nd, &dsize);
          if (buf) std::memcpy(buf, v, std::min<int64_t>(dsize, bufcap));
          return dsize;
        }
        if (c < 0) lo = mid + 1; else hi = mid - 1;
      }
      return -1;
    }
    if (!(fl & kPBranch)) return -1;
    int chosen = 0, lo = 1, hi = n - 1;  // node 0 has the empty key
    while (lo <= hi) {
      int mid = (lo + hi) / 2;
      const uint8_t* nd = env->node(pg, mid);
      int c = key_cmp(LmdbEnv::key_of(nd), LmdbEnv::ksize_of(nd),
                      key, static_cast<int>(klen));
      if (c <= 0) { chosen = mid; lo = mid + 1; } else { hi = mid - 1; }
    }
    pgno = LmdbEnv::child_pgno(env->node(pg, chosen));
  }
}

// In-order key dump. Fills lens[i] (when lens != nullptr, up to lens_cap)
// and concatenated key bytes into buf (when buf != nullptr, up to bufcap).
// Returns the TOTAL key bytes — call once with null buf to size, again to
// fill.
int64_t ideas_lmdb_dump_keys(void* h, uint8_t* buf, int64_t bufcap,
                             int32_t* lens, int64_t lens_cap) {
  const auto* env = static_cast<LmdbEnv*>(h);
  if (env->root == kPInvalid) return 0;
  int64_t total = 0, i = 0;
  env->walk_keys(env->root, [&](const uint8_t* k, uint16_t ks) {
    if (lens && i < lens_cap) lens[i] = ks;
    if (buf && total + ks <= bufcap) std::memcpy(buf + total, k, ks);
    total += ks;
    ++i;
  });
  return total;
}

// Simple self-test hook.
int ideas_native_abi_version() { return 2; }

}  // extern "C"
