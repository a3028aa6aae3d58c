// Standalone self-test: compile a URDF, round-trip the serialization, and
// exercise the RT loop with a trivial consumer.
#include <cstdio>
#include <cstring>

#include "dwbc_host/model.h"
#include "dwbc_host/rt_loop.h"

namespace {

void producer(double* state, int64_t tick, void*) {
  for (int i = 0; i < 8; ++i) state[i] = tick * 0.001 + i;
}

void consumer(const double* state, double* out, void*) {
  double acc = 0;
  for (int i = 0; i < 8; ++i) acc += state[i] * state[i];
  out[0] = acc;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::printf("usage: %s <urdf> [out.dwbcm]\n", argv[0]);
    return 2;
  }
  dwbc_host::CompiledModel m;
  std::string err;
  if (!dwbc_host::compile_urdf(argv[1], true, &m, &err)) {
    std::printf("compile failed: %s\n", err.c_str());
    return 1;
  }
  std::printf("model '%s': nbody=%d ndof=%d model_dof=%d mass=%.6f\n",
              m.name.c_str(), m.nbody, m.ndof, m.model_dof, m.total_mass);
  for (int i = 0; i < m.nbody && i < 8; ++i)
    std::printf("  body %d: %s parent=%d q=%d m=%.3f\n", i,
                m.body_names[i].c_str(), m.parent[i], m.q_index[i], m.mass[i]);

  const char* out = argc > 2 ? argv[2] : "/tmp/selftest.dwbcm";
  if (!m.save(out)) {
    std::printf("save failed\n");
    return 1;
  }
  dwbc_host::CompiledModel m2;
  if (!dwbc_host::CompiledModel::load(out, &m2) || m2.nbody != m.nbody ||
      std::abs(m2.total_mass - m.total_mass) > 1e-12) {
    std::printf("round-trip failed\n");
    return 1;
  }
  std::printf("serialization round-trip ok\n");

  dwbc_host::RtStats s =
      dwbc_host::run_rt_loop(8, 1, 500, 200, producer, consumer, nullptr);
  std::printf("rt loop: %lld ticks, avg %.2f us, p99 %.2f us, missed %lld\n",
              static_cast<long long>(s.ticks), s.avg_us, s.p99_us,
              static_cast<long long>(s.missed_deadlines));
  return 0;
}
