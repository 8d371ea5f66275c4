// Native event-stream parser for evo_tpu.
//
// TPU-native framework counterpart of the reference's mmap + multithreaded
// line parser (`tools/dataset_reader/include/dataset_reader/dataset_reader.h:33-97`
// and `tools/dataset_reader/src/mapped_file.cpp:34-67`): we keep the same
// architecture idea — mmap the file read-only, shard byte ranges across
// threads aligned to line boundaries, parse each shard independently — but
// the implementation is new and emits packed struct-of-arrays buffers
// (int64 µs timestamps, int16 pixel coords, int8 polarity) ready to be
// wrapped zero-copy by numpy and shipped to the TPU in one transfer.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// DAVIS240C `events.txt` line format: "<t_sec> <x> <y> <p>\n" with t in float
// seconds and p in {0,1} (mapped to {-1,+1} like davis240c_reader.cpp:85-88).

#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = ::open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (::fstat(m.fd, &st) != 0 || st.st_size == 0) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  ::madvise(p, st.st_size, MADV_SEQUENTIAL);
  m.data = static_cast<const char*>(p);
  m.size = static_cast<size_t>(st.st_size);
  return m;
}

void unmap(Mapped& m) {
  if (m.data) ::munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) ::close(m.fd);
  m.data = nullptr;
  m.fd = -1;
}

// Fast positive-decimal parse: integer part + fraction, no exponent
// (DAVIS timestamps are plain decimals). Advances *p past the number.
inline double parse_decimal(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t')) ++p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  uint64_t ip = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    ip = ip * 10 + static_cast<uint64_t>(*p - '0');
    ++p;
  }
  double val = static_cast<double>(ip);
  if (p < end && *p == '.') {
    ++p;
    uint64_t fp = 0;
    int digits = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      if (digits < 18) {
        fp = fp * 10 + static_cast<uint64_t>(*p - '0');
        ++digits;
      }
      ++p;
    }
    static const double kPow10[19] = {
        1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,  1e8,  1e9,
        1e10, 1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18};
    val += static_cast<double>(fp) / kPow10[digits];
  }
  return neg ? -val : val;
}

inline long parse_int(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t')) ++p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  long v = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    ++p;
  }
  return neg ? -v : v;
}

size_t count_newlines(const char* data, size_t n) {
  size_t count = 0;
  const char* p = data;
  const char* end = data + n;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) break;
    ++count;
    p = nl + 1;
  }
  return count;
}

}  // namespace

extern "C" {

// Count event lines in the file (parallel memchr over byte shards).
// Returns -1 if the file can't be mapped.
int64_t evo_count_events(const char* path, int num_threads) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  int nt = num_threads > 0 ? num_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  std::vector<size_t> counts(nt, 0);
  std::vector<std::thread> threads;
  size_t chunk = m.size / nt + 1;
  for (int i = 0; i < nt; ++i) {
    size_t lo = static_cast<size_t>(i) * chunk;
    size_t hi = lo + chunk;
    if (lo >= m.size) break;
    if (hi > m.size) hi = m.size;
    threads.emplace_back([&, i, lo, hi]() {
      counts[i] = count_newlines(m.data + lo, hi - lo);
    });
  }
  for (auto& t : threads) t.join();
  size_t total = 0;
  for (size_t c : counts) total += c;
  // File may not end with a newline: count the trailing partial line.
  if (m.size > 0 && m.data[m.size - 1] != '\n') ++total;
  unmap(m);
  return static_cast<int64_t>(total);
}

// Parse events.txt into preallocated struct-of-arrays buffers.
// t_us: int64 microseconds, x/y: int16, p: int8 in {-1, +1}.
// Returns the number of events written (<= capacity), or -1 on error.
int64_t evo_parse_events(const char* path, int64_t* t_us, int16_t* x,
                         int16_t* y, int8_t* p, int64_t capacity,
                         int num_threads) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  int nt = num_threads > 0 ? num_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;

  // Shard boundaries snapped forward to line starts.
  std::vector<size_t> starts(nt + 1, m.size);
  size_t chunk = m.size / nt + 1;
  starts[0] = 0;
  for (int i = 1; i < nt; ++i) {
    size_t pos = static_cast<size_t>(i) * chunk;
    if (pos >= m.size) {
      starts[i] = m.size;
      continue;
    }
    const char* nl = static_cast<const char*>(
        memchr(m.data + pos, '\n', m.size - pos));
    starts[i] = nl ? static_cast<size_t>(nl - m.data) + 1 : m.size;
  }
  starts[nt] = m.size;

  // Pass 1: per-shard line counts -> prefix offsets into the output arrays.
  std::vector<size_t> nlines(nt, 0);
  {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; ++i) {
      threads.emplace_back([&, i]() {
        size_t lo = starts[i], hi = starts[i + 1];
        if (lo >= hi) return;
        size_t c = count_newlines(m.data + lo, hi - lo);
        if (hi == m.size && m.size > 0 && m.data[m.size - 1] != '\n') ++c;
        nlines[i] = c;
      });
    }
    for (auto& t : threads) t.join();
  }
  std::vector<size_t> offsets(nt + 1, 0);
  for (int i = 0; i < nt; ++i) offsets[i + 1] = offsets[i] + nlines[i];
  int64_t total = static_cast<int64_t>(offsets[nt]);
  if (total > capacity) {
    unmap(m);
    return -2;  // caller must grow the buffers
  }

  // Pass 2: parse each shard directly into its output slice.
  {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; ++i) {
      threads.emplace_back([&, i]() {
        const char* ptr = m.data + starts[i];
        const char* end = m.data + starts[i + 1];
        size_t out = offsets[i];
        while (ptr < end) {
          double t_sec = parse_decimal(ptr, end);
          long xi = parse_int(ptr, end);
          long yi = parse_int(ptr, end);
          long pi = parse_int(ptr, end);
          t_us[out] = static_cast<int64_t>(t_sec * 1e6 + 0.5);
          x[out] = static_cast<int16_t>(xi);
          y[out] = static_cast<int16_t>(yi);
          p[out] = static_cast<int8_t>(pi > 0 ? 1 : -1);
          ++out;
          const char* nl =
              static_cast<const char*>(memchr(ptr, '\n', end - ptr));
          ptr = nl ? nl + 1 : end;
        }
      });
    }
    for (auto& t : threads) t.join();
  }
  unmap(m);
  return total;
}

}  // extern "C"
