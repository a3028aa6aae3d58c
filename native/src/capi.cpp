// C ABI for ctypes consumers (libdwbc_tpu.native).
#include <cstring>
#include <string>

#include "dwbc_host/golden_io.h"
#include "dwbc_host/model.h"
#include "dwbc_host/rt_loop.h"

extern "C" {

// Compile a URDF and serialize to `out_path` (.dwbcm). Returns 0 on success.
int dwbc_compile_urdf(const char* urdf_path, int floating,
                      const char* out_path, char* err, int err_len) {
  dwbc_host::CompiledModel m;
  std::string error;
  if (!dwbc_host::compile_urdf(urdf_path, floating != 0, &m, &error)) {
    if (err) std::strncpy(err, error.c_str(), err_len - 1);
    return 1;
  }
  if (!m.save(out_path)) {
    if (err) std::strncpy(err, "serialize failed", err_len - 1);
    return 2;
  }
  return 0;
}

// Quick model summary: [nbody, ndof, model_dof, floating] + total_mass.
int dwbc_model_info(const char* dwbcm_path, long long* dims,
                    double* total_mass) {
  dwbc_host::CompiledModel m;
  if (!dwbc_host::CompiledModel::load(dwbcm_path, &m)) return 1;
  dims[0] = m.nbody;
  dims[1] = m.ndof;
  dims[2] = m.model_dof;
  dims[3] = m.floating ? 1 : 0;
  *total_mass = m.total_mass;
  return 0;
}

double dwbc_golden_diff(const char* path, const double* data, long long rows,
                        long long cols) {
  return dwbc_host::golden_diff_norm(path, data, rows, cols);
}

int dwbc_golden_write(const char* path, const double* data, long long rows,
                      long long cols) {
  return dwbc_host::write_golden(path, data, rows, cols) ? 0 : 1;
}

// Run the real-time loop with ctypes callbacks; fills stats[6]:
// [avg_us, min_us, max_us, p99_us, ticks, missed_deadlines].
int dwbc_run_rt_loop(long long state_dim, long long out_dim,
                     long long period_us, long long ticks,
                     dwbc_host::ProducerFn producer,
                     dwbc_host::ConsumerFn consumer, void* user,
                     double* stats) {
  dwbc_host::RtStats s = dwbc_host::run_rt_loop(
      static_cast<size_t>(state_dim), static_cast<size_t>(out_dim), period_us,
      ticks, producer, consumer, user);
  stats[0] = s.avg_us;
  stats[1] = s.min_us;
  stats[2] = s.max_us;
  stats[3] = s.p99_us;
  stats[4] = static_cast<double>(s.ticks);
  stats[5] = static_cast<double>(s.missed_deadlines);
  return 0;
}

}  // extern "C"
