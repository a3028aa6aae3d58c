// Real-time control-loop harness (see rt_loop.cpp for rationale).
#pragma once

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace dwbc_host {

struct RtStats {
  double avg_us = 0, min_us = 0, max_us = 0, p99_us = 0;
  int64_t ticks = 0, missed_deadlines = 0;
};

// Seqlock-protected double buffer: producer writes alternate slots and
// publishes with a release-ordered sequence bump; the consumer retries if a
// write overlapped its read. The producer never blocks.
class StateBuffer {
 public:
  explicit StateBuffer(size_t n) : n_(n) {
    buf_[0].resize(n);
    buf_[1].resize(n);
  }

  void write(const double* src) {
    uint64_t s = seq_.load(std::memory_order_relaxed);
    int slot = static_cast<int>((s >> 1) & 1) ^ 1;
    seq_.store(s + 1, std::memory_order_release);  // odd: writing
    std::memcpy(buf_[slot].data(), src, n_ * sizeof(double));
    seq_.store(s + 2, std::memory_order_release);  // even: published
  }

  // Returns the sequence number of the snapshot (monotone, even).
  uint64_t read(double* dst) const {
    for (;;) {
      uint64_t s1 = seq_.load(std::memory_order_acquire);
      if (s1 & 1) continue;
      int slot = static_cast<int>((s1 >> 1) & 1);
      std::memcpy(dst, buf_[slot].data(), n_ * sizeof(double));
      uint64_t s2 = seq_.load(std::memory_order_acquire);
      if (s1 == s2) return s1;
    }
  }

  size_t size() const { return n_; }

 private:
  size_t n_;
  std::vector<double> buf_[2];
  mutable std::atomic<uint64_t> seq_{0};
};

using ProducerFn = void (*)(double* state, int64_t tick, void* user);
using ConsumerFn = void (*)(const double* state, double* out, void* user);

RtStats run_rt_loop(size_t state_dim, size_t out_dim, int64_t period_us,
                    int64_t ticks, ProducerFn producer, ConsumerFn consumer,
                    void* user);

}  // namespace dwbc_host
