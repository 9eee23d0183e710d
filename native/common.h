// Shared helpers for the bwamem_tpu native host runtime.
//
// Everything here is a behavioral transcription of the corresponding
// Python spec (bwamem_tpu/utils/ksort.py, utils/hashing.py,
// index/bntseq.py get_seq, core/region.py cal_max_gap) — the Python
// stays the executable spec; bit-identical results are required.

#ifndef BWAMEM_NATIVE_COMMON_H_
#define BWAMEM_NATIVE_COMMON_H_

#include <cstddef>
#include <cstdint>
#include <atomic>
#include <cstdlib>
#include <thread>
#include <utility>
#include <vector>

// Team size for the embarrassingly-parallel chunk loops
// (deterministic output regardless; BWAMEM_TPU_NATIVE_THREADS caps it)
inline int bm_nthreads() {
  static int n = [] {
    const char* e = std::getenv("BWAMEM_TPU_NATIVE_THREADS");
    if (e && *e) {
      int v = std::atoi(e);
      return v > 0 ? v : 1;
    }
    unsigned hc = std::thread::hardware_concurrency();
    return hc ? static_cast<int>(hc) : 1;
  }();
  return n;
}

// Fork-safe parallel for: fresh std::threads per call, joined before
// returning, so no thread-pool state survives into a fork (the -t
// worker pool forks the process between native calls; a persistent
// OpenMP pool deadlocks its children).  Work is claimed dynamically
// in `grain`-sized blocks.
template <typename F>
inline void bm_parallel_for(int n, int grain, F f) {
  int nt = bm_nthreads();
  if (nt > n / grain) nt = n / grain;
  if (nt <= 1) {
    for (int i = 0; i < n; ++i) f(i);
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int lo = next.fetch_add(grain);
      if (lo >= n) break;
      int hi = lo + grain < n ? lo + grain : n;
      for (int i = lo; i < hi; ++i) f(i);
    }
  };
  std::vector<std::thread> ts;
  ts.reserve(nt - 1);
  for (int t = 0; t < nt - 1; ++t) ts.emplace_back(worker);
  worker();
  for (auto& t : ts) t.join();
}

namespace bm {

inline uint64_t hash64(uint64_t key) {
  key = key + ~(key << 32);
  key ^= key >> 22;
  key = key + ~(key << 13);
  key ^= key >> 8;
  key = key + (key << 3);
  key ^= key >> 15;
  key = key + ~(key << 27);
  key ^= key >> 31;
  return key;
}

// ---- ks_introsort emulation (exact permutation; spec: utils/ksort.py)

template <typename T, typename Lt>
void insertsort(std::vector<T>& a, Lt lt, int s, int t) {
  for (int i = s + 1; i < t; ++i)
    for (int j = i; j > s && lt(a[j], a[j - 1]); --j)
      std::swap(a[j], a[j - 1]);
}

template <typename T, typename Lt>
void combsort(std::vector<T>& a, Lt lt, int s, int n) {
  const double shrink = 1.2473309501039786540366528676643;
  int gap = n;
  for (;;) {
    if (gap > 2) {
      gap = static_cast<int>(gap / shrink);
      if (gap == 9 || gap == 10) gap = 11;
    }
    bool swapped = false;
    for (int i = s; i < s + n - gap; ++i) {
      int j = i + gap;
      if (lt(a[j], a[i])) {
        std::swap(a[i], a[j]);
        swapped = true;
      }
    }
    if (!(swapped || gap > 2)) break;
  }
  if (gap != 1) insertsort(a, lt, s, s + n);
}

template <typename T, typename Lt>
void ks_introsort(std::vector<T>& a, Lt lt) {
  int n = static_cast<int>(a.size());
  if (n < 1) return;
  if (n == 2) {
    if (lt(a[1], a[0])) std::swap(a[0], a[1]);
    return;
  }
  int d = 2;
  while ((1 << d) < n) ++d;
  struct Frame {
    int s, t, d;
  };
  std::vector<Frame> stack;
  int s = 0, t = n - 1;
  d <<= 1;
  for (;;) {
    if (s < t) {
      if (--d == 0) {
        combsort(a, lt, s, t - s + 1);
        t = s;
        continue;
      }
      int i = s, j = t;
      int k = i + ((j - i) >> 1) + 1;
      if (lt(a[k], a[i])) {
        if (lt(a[k], a[j])) k = j;
      } else {
        k = lt(a[j], a[i]) ? i : j;
      }
      T rp = a[k];
      if (k != t) std::swap(a[k], a[t]);
      for (;;) {
        do ++i;
        while (lt(a[i], rp));
        do --j;
        while (i <= j && lt(rp, a[j]));
        if (j <= i) break;
        std::swap(a[i], a[j]);
      }
      std::swap(a[i], a[t]);
      if (i - s > t - i) {
        if (i - s > 16) stack.push_back({s, i - 1, d});
        s = t - i > 16 ? i + 1 : t;
      } else {
        if (t - i > 16) stack.push_back({i + 1, t, d});
        t = i - s > 16 ? i - 1 : s;
      }
    } else {
      if (stack.empty()) {
        insertsort(a, lt, 0, n);
        return;
      }
      s = stack.back().s;
      t = stack.back().t;
      d = stack.back().d;
      stack.pop_back();
    }
  }
}

// ---- reference fetch (bns_get_seq; spec: index/bntseq.py get_seq)

inline uint8_t pac_get(const uint8_t* pac, int64_t l) {
  return (pac[l >> 2] >> ((~l & 3) << 1)) & 3;
}

// fetch [beg,end) of the logical doubled reference; empty on bridging
inline std::vector<uint8_t> get_seq(int64_t l_pac, const uint8_t* pac,
                                    int64_t beg, int64_t end) {
  if (end < beg) std::swap(beg, end);
  if (end > l_pac << 1) end = l_pac << 1;
  if (beg < 0) beg = 0;
  std::vector<uint8_t> out;
  if (beg >= l_pac || end <= l_pac) {
    out.resize(static_cast<size_t>(end - beg));
    if (beg >= l_pac) {  // reverse strand: complement, descending fwd
      int64_t beg_f = (l_pac << 1) - end;
      for (int64_t k = 0; k < end - beg; ++k)
        out[static_cast<size_t>(end - beg - 1 - k)] =
            3 - pac_get(pac, beg_f + k);
    } else {
      for (int64_t k = 0; k < end - beg; ++k)
        out[static_cast<size_t>(k)] = pac_get(pac, beg + k);
    }
  }
  return out;
}

// cal_max_gap (spec: core/region.py cal_max_gap)
inline int cal_max_gap(int a, int o_del, int e_del, int o_ins, int e_ins,
                       int w, int qlen) {
  int l_del = static_cast<int>(
      static_cast<double>(static_cast<int64_t>(qlen) * a - o_del) / e_del +
      1.0);
  int l_ins = static_cast<int>(
      static_cast<double>(static_cast<int64_t>(qlen) * a - o_ins) / e_ins +
      1.0);
  int l = l_del > l_ins ? l_del : l_ins;
  if (l < 1) l = 1;
  return l < w * 2 ? l : w * 2;
}

}  // namespace bm

#endif  // BWAMEM_NATIVE_COMMON_H_
