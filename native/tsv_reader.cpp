// Native TSV random-access reader (data-loader fast path).
//
// The Python TSVFile (gligen_tpu/data/tsv.py) mirrors the reference's
// seek/readline engine (dataset/tsv.py:40-188).  On TPU hosts the input
// pipeline shares a small number of CPU cores with the runtime, so the
// hot loop — lineidx lookup + row read — is provided natively:
//   * the .lineidx file is parsed once into an int64 offset table,
//   * rows are fetched with pread() (no shared file position, so one
//     handle serves any number of threads/processes — the reference
//     needs per-PID reopen for this, tsv.py:176-188),
//   * row length comes from the offset delta, avoiding the Python
//     readline byte-scan.
//
// C ABI for ctypes (gligen_tpu/data/native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct TsvHandle {
  int fd = -1;
  int64_t file_size = 0;
  std::vector<int64_t> offsets;  // start byte of each row
};

int64_t row_end(const TsvHandle* h, int64_t row) {
  return (row + 1 < (int64_t)h->offsets.size()) ? h->offsets[row + 1]
                                                : h->file_size;
}

}  // namespace

extern "C" {

// Opens tsv + lineidx. Returns handle or nullptr.
void* tsv_open(const char* tsv_path, const char* lineidx_path) {
  FILE* idx = fopen(lineidx_path, "r");
  if (!idx) return nullptr;
  auto* h = new TsvHandle();
  // lineidx is one decimal offset per line
  char buf[64];
  while (fgets(buf, sizeof(buf), idx)) {
    if (buf[0] == '\n' || buf[0] == '\0') continue;
    h->offsets.push_back(strtoll(buf, nullptr, 10));
  }
  fclose(idx);

  h->fd = open(tsv_path, O_RDONLY);
  if (h->fd < 0) {
    delete h;
    return nullptr;
  }
  struct stat st;
  if (fstat(h->fd, &st) != 0) {
    close(h->fd);
    delete h;
    return nullptr;
  }
  h->file_size = st.st_size;
#ifdef POSIX_FADV_RANDOM
  posix_fadvise(h->fd, 0, 0, POSIX_FADV_RANDOM);
#endif
  return h;
}

int64_t tsv_num_rows(void* handle) {
  return handle ? (int64_t)static_cast<TsvHandle*>(handle)->offsets.size() : -1;
}

// Byte length of row (incl. trailing newline) — callers size buffers with this.
int64_t tsv_row_size(void* handle, int64_t row) {
  auto* h = static_cast<TsvHandle*>(handle);
  if (!h || row < 0 || row >= (int64_t)h->offsets.size()) return -1;
  return row_end(h, row) - h->offsets[row];
}

// Reads row bytes into buf (up to buf_size). Returns bytes written or -1.
int64_t tsv_read_row(void* handle, int64_t row, char* buf, int64_t buf_size) {
  auto* h = static_cast<TsvHandle*>(handle);
  if (!h || row < 0 || row >= (int64_t)h->offsets.size()) return -1;
  int64_t start = h->offsets[row];
  int64_t len = row_end(h, row) - start;
  if (len > buf_size) return -1;
  int64_t done = 0;
  while (done < len) {
    ssize_t n = pread(h->fd, buf + done, len - done, start + done);
    if (n <= 0) return -1;
    done += n;
  }
  return len;
}

void tsv_close(void* handle) {
  auto* h = static_cast<TsvHandle*>(handle);
  if (!h) return;
  if (h->fd >= 0) close(h->fd);
  delete h;
}

// Generates a lineidx for a TSV (reference generate_lineidx, tsv.py:15-24).
// Returns number of rows or -1.
int64_t tsv_generate_lineidx(const char* tsv_path, const char* idx_path) {
  FILE* in = fopen(tsv_path, "rb");
  if (!in) return -1;
  FILE* out = fopen(idx_path, "w");
  if (!out) {
    fclose(in);
    return -1;
  }
  int64_t rows = 0, pos = 0;
  std::vector<char> buf(1 << 20);
  int64_t line_start = 0;
  size_t n;
  while ((n = fread(buf.data(), 1, buf.size(), in)) > 0) {
    for (size_t i = 0; i < n; i++) {
      if (line_start >= 0) {
        fprintf(out, "%lld\n", (long long)line_start);
        rows++;
        line_start = -1;
      }
      if (buf[i] == '\n') line_start = pos + (int64_t)i + 1;
    }
    pos += (int64_t)n;
  }
  fclose(in);
  fclose(out);
  return rows;
}

}  // extern "C"
