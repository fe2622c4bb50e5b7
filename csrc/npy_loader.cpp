// Native data-path runtime: parallel batch gather + fused normalization over
// memory-mapped .npy artifacts.
//
// The reference feeds its trainers through torch DataLoader worker processes
// and the native decord reader (reference tuneavideo/data/dataset.py:8-9;
// requirements.txt decord) — its "native data loader" surface.  This is the
// TPU-framework counterpart: the inter-stage artifacts here are .npy tensors
// (SURVEY.md section 1), so the hot host-side work is gathering shuffled
// training rows out of big mmap'd arrays and z-scoring them before
// device_put.  Both run multi-threaded in C++, off the GIL.
//
// C API (ctypes-friendly):
//   nbl_open(path)                      -> handle (mmap + npy header parse)
//   nbl_row_bytes(h) / nbl_rows(h) / nbl_dtype(h)
//   nbl_gather(h, idx, n, out)          -> parallel row gather
//   nbl_gather_norm_f32(h, idx, n, mean, std, dim, out)
//                                       -> gather + (x-mean)/std fused, f32
//   nbl_close(h)
//
// Build: scripts/build_native.sh (g++ -O3 -shared -fPIC -pthread).

#include <algorithm>
#include <atomic>
#include <functional>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Loader {
  int fd = -1;
  const uint8_t* base = nullptr;  // mmap base
  size_t file_size = 0;
  const uint8_t* data = nullptr;  // first element
  size_t row_bytes = 0;           // bytes per leading-axis row
  int64_t rows = 0;
  int dtype = 0;  // 4 = f32, 8 = f64 (element size)
};

int n_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n > 1 ? static_cast<int>(n) : 1;
}

// parse the .npy v1/v2 header; returns false on unsupported layouts
bool parse_npy(Loader* L) {
  if (L->file_size < 10 || memcmp(L->base, "\x93NUMPY", 6) != 0) return false;
  const uint8_t major = L->base[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = L->base[8] | (L->base[9] << 8);
    hoff = 10;
  } else {
    hlen = L->base[8] | (L->base[9] << 8) | (L->base[10] << 16) |
           (static_cast<size_t>(L->base[11]) << 24);
    hoff = 12;
  }
  std::string hdr(reinterpret_cast<const char*>(L->base + hoff), hlen);
  if (hdr.find("'fortran_order': False") == std::string::npos) return false;
  int elem = 0;
  if (hdr.find("'<f4'") != std::string::npos) elem = 4;
  else if (hdr.find("'<f8'") != std::string::npos) elem = 8;
  else return false;
  size_t sp = hdr.find("'shape': (");
  if (sp == std::string::npos) return false;
  sp += 10;
  size_t ep = hdr.find(')', sp);
  std::string shape = hdr.substr(sp, ep - sp);
  // leading dim, then product of the rest
  int64_t lead = 0, rest = 1;
  const char* s = shape.c_str();
  char* end;
  lead = strtoll(s, &end, 10);
  s = end;
  while (*s) {
    if (*s == ',' || *s == ' ') { ++s; continue; }
    int64_t d = strtoll(s, &end, 10);
    if (end == s) break;
    rest *= d;
    s = end;
  }
  L->data = L->base + hoff + hlen;
  L->dtype = elem;
  L->rows = lead;
  L->row_bytes = static_cast<size_t>(rest) * elem;
  return (L->data - L->base) + static_cast<size_t>(lead) * L->row_bytes <= L->file_size;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  int T = n_threads();
  if (n < 4 * T) { fn(0, n); return; }
  std::vector<std::thread> ts;
  int64_t chunk = (n + T - 1) / T;
  for (int t = 0; t < T; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void* nbl_open(const char* path) {
  Loader* L = new Loader();
  L->fd = open(path, O_RDONLY);
  if (L->fd < 0) { delete L; return nullptr; }
  struct stat st;
  fstat(L->fd, &st);
  L->file_size = static_cast<size_t>(st.st_size);
  L->base = static_cast<const uint8_t*>(
      mmap(nullptr, L->file_size, PROT_READ, MAP_PRIVATE, L->fd, 0));
  if (L->base == MAP_FAILED || !parse_npy(L)) {
    if (L->base != MAP_FAILED) munmap(const_cast<uint8_t*>(L->base), L->file_size);
    close(L->fd);
    delete L;
    return nullptr;
  }
  madvise(const_cast<uint8_t*>(L->base), L->file_size, MADV_WILLNEED);
  return L;
}

int64_t nbl_rows(void* h) { return static_cast<Loader*>(h)->rows; }
int64_t nbl_row_bytes(void* h) { return static_cast<Loader*>(h)->row_bytes; }
int nbl_dtype(void* h) { return static_cast<Loader*>(h)->dtype; }

// gather raw rows: out must hold n * row_bytes
int nbl_gather(void* h, const int64_t* idx, int64_t n, uint8_t* out) {
  Loader* L = static_cast<Loader*>(h);
  std::atomic<int> bad{0};
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t r = idx[i];
      if (r < 0 || r >= L->rows) { bad.store(1); continue; }
      memcpy(out + i * L->row_bytes, L->data + r * L->row_bytes, L->row_bytes);
    }
  });
  return bad.load();
}

// gather + fused z-score into float32. dim = elements per row; mean/std are
// length-dim vectors (sklearn StandardScaler semantics).
int nbl_gather_norm_f32(void* h, const int64_t* idx, int64_t n,
                        const float* mean, const float* stddev, int64_t dim,
                        float* out) {
  Loader* L = static_cast<Loader*>(h);
  if (static_cast<size_t>(dim) * L->dtype != L->row_bytes) return 2;
  std::atomic<int> bad{0};
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t r = idx[i];
      if (r < 0 || r >= L->rows) { bad.store(1); continue; }
      float* dst = out + i * dim;
      const uint8_t* src = L->data + r * L->row_bytes;
      if (L->dtype == 4) {
        const float* s = reinterpret_cast<const float*>(src);
        for (int64_t j = 0; j < dim; ++j) dst[j] = (s[j] - mean[j]) / stddev[j];
      } else {
        const double* s = reinterpret_cast<const double*>(src);
        for (int64_t j = 0; j < dim; ++j)
          dst[j] = (static_cast<float>(s[j]) - mean[j]) / stddev[j];
      }
    }
  });
  return bad.load();
}

void nbl_close(void* h) {
  Loader* L = static_cast<Loader*>(h);
  if (L->base) munmap(const_cast<uint8_t*>(L->base), L->file_size);
  if (L->fd >= 0) close(L->fd);
  delete L;
}

}  // extern "C"
