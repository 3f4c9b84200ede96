// Fast dataset parser for the reference on-disk format.
//
// Native replacement for the framework's hot host-side I/O path — the
// reference's parsers are C++ iostream loops
// (/root/reference/src/files_utils.cpp:19-93); this one mmaps the file and
// scans it with strtod directly, no stream machinery, no per-line string
// allocation. Exposed through a minimal C ABI consumed via ctypes
// (visual_odometry_tpu/native/dataloader.py).
//
// Grammar: whitespace-separated token table. The first `skiprows` lines are
// skipped; on each remaining non-empty line, `first_col` leading tokens are
// discarded (e.g. the literal "point" keyword) and the next `n_cols` tokens
// are parsed as doubles. Lines with fewer than first_col + n_cols tokens
// are ignored (matches the loadtxt/getline tolerance for blank tails).

#include <cstdlib>
#include <cstring>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* skip_token(const char* p, const char* end) {
  while (p < end && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n') ++p;
  return p;
}

}  // namespace

extern "C" {

// Returns the number of parsed rows (>= 0) and stores a malloc'd row-major
// [rows x n_cols] double array in *out_data (caller frees via vo_free), or
// returns -1 on I/O failure / parse error.
long vo_parse_table(const char* path, int skiprows, int first_col, int n_cols,
                    double** out_data) {
  *out_data = nullptr;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return st.st_size == 0 ? 0 : -1;
  }
  const size_t size = static_cast<size_t>(st.st_size);
  void* mapped = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mapped == MAP_FAILED) return -1;
  const char* p = static_cast<const char*>(mapped);
  const char* end = p + size;

  for (int i = 0; i < skiprows && p < end; ++i) {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }

  std::vector<double> values;
  values.reserve(1024);
  long rows = 0;
  while (p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (*p == '\n') {  // empty line
      ++p;
      continue;
    }
    const char* line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;

    const char* q = p;
    bool ok = true;
    for (int c = 0; c < first_col; ++c) {
      q = skip_ws(q, line_end);
      const char* t = skip_token(q, line_end);
      if (t == q) {
        ok = false;
        break;
      }
      q = t;
    }
    size_t row_start = values.size();
    if (ok) {
      for (int c = 0; c < n_cols; ++c) {
        q = skip_ws(q, line_end);
        char* next = nullptr;
        double v = strtod(q, &next);
        if (next == q || next > line_end) {
          ok = false;
          break;
        }
        values.push_back(v);
        q = next;
      }
    }
    if (ok) {
      ++rows;
    } else {
      values.resize(row_start);  // drop partial row (short/blank line)
    }
    p = (line_end < end) ? line_end + 1 : end;
  }
  munmap(mapped, size);

  double* out = static_cast<double*>(malloc(values.size() * sizeof(double)));
  if (!out && !values.empty()) return -1;
  std::memcpy(out, values.data(), values.size() * sizeof(double));
  *out_data = out;
  return rows;
}

void vo_free(double* p) { free(p); }

}  // extern "C"
