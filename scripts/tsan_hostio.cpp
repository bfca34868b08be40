// ThreadSanitizer harness for the host IO / plan engine's threaded core
// (SURVEY.md §5.2: the C++ host pipeline must be TSAN-clean).
//
// Exercises the exact production threading pattern of
// io/_hostio.cpp::build_window_plans — a pool of workers pulling event
// indices from an atomic counter, each writing its own EventPlans slot —
// at dune3d-like scale, plus a concurrent reader of the shared inputs.
//
// Build + run (scripts/run_tsan.sh):
//   g++ -fsanitize=thread -O1 -g -std=c++17 scripts/tsan_hostio.cpp \
//       -o /tmp/tsan_hostio -lpthread && /tmp/tsan_hostio

#include <cstdio>
#include <random>

#include "../sparseeventid_tpu/io/_hostio_core.h"

using namespace hostio_core;

int main() {
  const long B = 8, CAP = 8192, DEPTH = 3;
  const int64_t grid[3] = {256, 128, 320};
  std::vector<long> caps = {CAP, CAP / 2, CAP / 4, CAP / 8};
  const long init_k[3] = {5, 5, 5};
  // per-level series kernels ([depth+1][3])
  std::vector<long> ser_k;
  for (long l = 0; l <= DEPTH; ++l) ser_k.insert(ser_k.end(), {3, 3, 3});
  const long stride[3] = {2, 2, 2};
  std::vector<PlanShape> series_ps(DEPTH + 1), down_ps(DEPTH);
  for (long l = 0; l <= DEPTH; ++l) series_ps[l] = {176, 512};
  for (long l = 0; l < DEPTH; ++l) down_ps[l] = {320, 512};
  PlanShape initial_ps = {176, 2048};

  // synthetic track-like events
  std::vector<int32_t> coords(B * CAP * 3, -1);
  std::mt19937_64 rng(0);
  for (long b = 0; b < B; ++b) {
    std::uniform_real_distribution<double> u(0.2, 0.8);
    std::normal_distribution<double> n01(0.0, 1.0);
    long w = 0;
    for (int t = 0; t < 16 && w < CAP; ++t) {
      double s[3], d[3], norm = 0;
      for (int i = 0; i < 3; ++i) {
        s[i] = u(rng) * double(grid[i]);
        d[i] = n01(rng);
        norm += d[i] * d[i];
      }
      norm = std::sqrt(norm);
      for (long step = 0; step < 400 && w < CAP; ++step) {
        for (int i = 0; i < 3; ++i) {
          long c = long(s[i] + step * 1.5 * d[i] / norm + n01(rng) * 0.5);
          c = std::max(0L, std::min(c, long(grid[i]) - 1));
          coords[(b * CAP + w) * 3 + i] = int32_t(c);
        }
        ++w;
      }
    }
  }

  std::vector<EventPlans> evs(static_cast<size_t>(B));
  std::atomic<long> next(0);
  std::atomic<long> checksum(0);
  auto work = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= B) return;
      build_event_plans(coords.data() + i * CAP * 3, CAP, grid, caps.data(),
                        DEPTH, init_k, ser_k.data(), stride, series_ps.data(),
                        initial_ps, down_ps.data(), 176, &evs[size_t(i)]);
      long acc = 0;
      for (auto& lv : evs[size_t(i)].levels) acc += long(lv.keys.size());
      checksum.fetch_add(acc);
    }
  };
  // concurrent reader of the shared coords (read-only — must be race-free)
  std::atomic<bool> stop(false);
  std::thread reader([&]() {
    long acc = 0;
    while (!stop.load()) {
      for (long i = 0; i < B * CAP * 3; i += 977) acc += coords[size_t(i)];
    }
    if (acc == 42) std::printf("never\n");
  });
  std::vector<std::thread> pool;
  for (int t = 0; t < 8; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  stop.store(true);
  reader.join();

  long sites = checksum.load();
  std::printf("tsan_hostio: %ld total pyramid sites across %ld events OK\n",
              sites, B);
  return sites > 0 ? 0 : 1;
}
