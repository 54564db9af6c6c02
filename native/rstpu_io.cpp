// Native host data-plane for retrieval_scaling_tpu.
//
// The serving tier fetches every retrieval hit with a byte seek into the
// passage jsonl (reference: src/indicies/flat.py:115-120), and datastore
// builds scan multi-GB jsonl files to record line offsets (reference:
// src/indicies/index_utils.py:84-99). Both are hot host paths at datastore
// scale; this library implements them with buffered scans and threaded
// positional reads, exposed through a C ABI consumed via ctypes (no
// pybind11 in the build image).
//
// Build: g++ -O3 -shared -fPIC -o librstpu_io.so rstpu_io.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

// Scan a file for line-start byte offsets.
// Returns the number of lines; offsets are written to *out (malloc'd,
// caller frees via rstpu_free). Returns -1 on error.
int64_t rstpu_scan_offsets(const char* path, int64_t** out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;

  constexpr size_t kBuf = 1 << 20;
  std::vector<char> buf(kBuf);
  std::vector<int64_t> offsets;
  offsets.reserve(1 << 16);

  int64_t pos = 0;
  bool at_line_start = true;
  ssize_t got;
  while ((got = read(fd, buf.data(), kBuf)) > 0) {
    for (ssize_t i = 0; i < got; ++i) {
      if (at_line_start) {
        offsets.push_back(pos + i);
        at_line_start = false;
      }
      if (buf[i] == '\n') at_line_start = true;
    }
    pos += got;
  }
  close(fd);
  if (got < 0) return -1;

  *out = static_cast<int64_t*>(malloc(offsets.size() * sizeof(int64_t)));
  if (*out == nullptr) return -1;
  memcpy(*out, offsets.data(), offsets.size() * sizeof(int64_t));
  return static_cast<int64_t>(offsets.size());
}

void rstpu_free(void* ptr) { free(ptr); }

// Batched positional reads: for each record i, read
// [starts[i], starts[i] + lens[i]) from the file into out + out_offsets[i].
// Reads run on `threads` workers (network filesystems hide latency behind
// parallel preads). Returns 0 on success, -1 on any failure.
int rstpu_pread_many(const char* path,
                     const int64_t* starts,
                     const int64_t* lens,
                     const int64_t* out_offsets,
                     char* out,
                     int64_t n,
                     int threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;

  if (threads < 1) threads = 1;
  if (threads > 64) threads = 64;
  std::atomic<int64_t> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      int64_t remaining = lens[i];
      int64_t off = starts[i];
      char* dst = out + out_offsets[i];
      while (remaining > 0) {
        ssize_t got = pread(fd, dst, static_cast<size_t>(remaining), off);
        if (got <= 0) {
          failed.store(1);
          return;
        }
        remaining -= got;
        off += got;
        dst += got;
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  close(fd);
  return failed.load() ? -1 : 0;
}

// File size helper (avoids a Python stat round-trip in the fetch path).
int64_t rstpu_file_size(const char* path) {
  struct stat st;
  if (stat(path, &st) != 0) return -1;
  return static_cast<int64_t>(st.st_size);
}

}  // extern "C"
