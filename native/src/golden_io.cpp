// Binary golden-matrix IO, byte-compatible with the reference's
// write_binary/check_binary format (int64 rows, int64 cols, column-major
// float64 — /root/reference/tests/dwbc_test_util.h:15-70).
#include "dwbc_host/golden_io.h"

#include <cmath>
#include <fstream>

namespace dwbc_host {

bool write_golden(const std::string& path, const double* data, int64_t rows,
                  int64_t cols) {
  std::ofstream f(path, std::ios::binary | std::ios::trunc);
  if (!f) return false;
  f.write(reinterpret_cast<const char*>(&rows), 8);
  f.write(reinterpret_cast<const char*>(&cols), 8);
  f.write(reinterpret_cast<const char*>(data), rows * cols * 8);
  return static_cast<bool>(f);
}

bool read_golden(const std::string& path, std::vector<double>* data,
                 int64_t* rows, int64_t* cols) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  if (!f.read(reinterpret_cast<char*>(rows), 8)) return false;
  if (!f.read(reinterpret_cast<char*>(cols), 8)) return false;
  data->resize(static_cast<size_t>(*rows * *cols));
  return static_cast<bool>(
      f.read(reinterpret_cast<char*>(data->data()), *rows * *cols * 8));
}

double golden_diff_norm(const std::string& path, const double* data,
                        int64_t rows, int64_t cols) {
  std::vector<double> ref;
  int64_t r, c;
  if (!read_golden(path, &ref, &r, &c)) return -1.0;
  if (r != rows || c != cols) return -2.0;
  double acc = 0;
  for (size_t i = 0; i < ref.size(); ++i) {
    double d = ref[i] - data[i];
    acc += d * d;
  }
  return std::sqrt(acc);
}

}  // namespace dwbc_host
