#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace dwbc_host {

// Golden-matrix binary format: int64 rows, int64 cols, column-major float64
// (byte-compatible with the reference test fixtures in tests/cases/).
bool write_golden(const std::string& path, const double* data, int64_t rows,
                  int64_t cols);
bool read_golden(const std::string& path, std::vector<double>* data,
                 int64_t* rows, int64_t* cols);
// Frobenius norm of (file - data); negative on IO/shape errors.
double golden_diff_norm(const std::string& path, const double* data,
                        int64_t rows, int64_t cols);

}  // namespace dwbc_host
