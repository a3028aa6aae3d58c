// Real-time control-loop harness: producer/consumer with a lock-free
// double-buffered state hand-off.
//
// Native equivalent of the reference's two-thread real-time pattern
// (/root/reference/tests/test_thread.cpp:10-211): a state producer ticks at
// a fixed period, a solver consumer runs as fast as results are needed, and
// the hand-off is wait-free for the producer (seqlock over a double buffer
// instead of the reference's spin-lock + full RobotData deep copy).
//
// The consumer callback is a plain C function pointer so the harness can
// drive either a native solver or (via ctypes) the compiled JAX executable.
#include "dwbc_host/rt_loop.h"

#include <algorithm>
#include <chrono>
#include <thread>

namespace dwbc_host {

using Clock = std::chrono::steady_clock;

RtStats run_rt_loop(size_t state_dim, size_t out_dim, int64_t period_us,
                    int64_t ticks, ProducerFn producer, ConsumerFn consumer,
                    void* user) {
  StateBuffer sb(state_dim);
  std::atomic<bool> done{false};
  std::vector<double> lat_us;
  lat_us.reserve(static_cast<size_t>(ticks));
  RtStats stats;

  std::thread prod([&] {
    std::vector<double> state(state_dim, 0.0);
    auto next = Clock::now();
    for (int64_t t = 0; t < ticks; ++t) {
      producer(state.data(), t, user);
      sb.write(state.data());
      next += std::chrono::microseconds(period_us);
      auto now = Clock::now();
      if (now > next)
        ++stats.missed_deadlines;
      else
        std::this_thread::sleep_until(next);
    }
    done.store(true, std::memory_order_release);
  });

  std::thread cons([&] {
    std::vector<double> state(state_dim, 0.0);
    std::vector<double> out(out_dim, 0.0);
    uint64_t last_seq = 0;
    while (!done.load(std::memory_order_acquire)) {
      uint64_t s = sb.read(state.data());
      if (s == last_seq) {
        std::this_thread::yield();
        continue;
      }
      last_seq = s;
      auto t0 = Clock::now();
      consumer(state.data(), out.data(), user);
      auto t1 = Clock::now();
      lat_us.push_back(
          std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0).count() /
          1000.0);
    }
  });

  prod.join();
  cons.join();

  if (!lat_us.empty()) {
    double sum = 0, mn = lat_us[0], mx = lat_us[0];
    for (double v : lat_us) {
      sum += v;
      mn = std::min(mn, v);
      mx = std::max(mx, v);
    }
    std::vector<double> sorted = lat_us;
    std::sort(sorted.begin(), sorted.end());
    stats.avg_us = sum / lat_us.size();
    stats.min_us = mn;
    stats.max_us = mx;
    stats.p99_us = sorted[static_cast<size_t>(0.99 * (sorted.size() - 1))];
    stats.ticks = static_cast<int64_t>(lat_us.size());
  }
  return stats;
}

}  // namespace dwbc_host
