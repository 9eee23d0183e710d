// Native seed chaining for bwamem_tpu: SA-resolved seed occurrences ->
// chains, for a whole chunk in one call.
//
// Behavioral spec: bwamem_tpu/core/chain.py (mem_chain's kbtree
// insertion, software/bwamem.c:316-615).  The reference keeps chains in
// a B-tree ordered by the first seed's position and merges each new
// seed into the closest chain at or before it (kb_intervalp `lower`);
// a sorted array with binary search reproduces that exactly, including
// the in-order traversal that fixes the final chain order.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Seed {
  int64_t rbeg;
  int32_t qbeg, len;
};

struct Chain {
  int64_t pos;
  std::vector<Seed> seeds;
};

// test_and_merge (spec: core/chain.py _test_and_merge).  True if the
// seed is contained in / merged into chain c; false requests a new
// chain.
bool test_and_merge(int64_t l_pac, int32_t w, int32_t max_chain_gap,
                    Chain& c, const Seed& s) {
  const Seed& last = c.seeds.back();
  const Seed& first = c.seeds.front();
  int64_t qend = static_cast<int64_t>(last.qbeg) + last.len;
  int64_t rend = last.rbeg + last.len;
  if (s.qbeg >= first.qbeg && s.qbeg + s.len <= qend &&
      s.rbeg >= first.rbeg && s.rbeg + s.len <= rend)
    return true;  // contained seed
  if ((last.rbeg < l_pac || first.rbeg < l_pac) && s.rbeg >= l_pac)
    return false;  // different strand
  int64_t x = s.qbeg - last.qbeg;  // non-negative
  int64_t y = s.rbeg - last.rbeg;
  if (y >= 0 && x - y <= w && y - x <= w && x - last.len < max_chain_gap &&
      y - last.len < max_chain_gap) {
    c.seeds.push_back(s);
    return true;
  }
  return false;
}

}  // namespace

extern "C" {

// Chain every read's seed occurrences.  Seeds arrive flattened with a
// per-read offset array; bridging seeds (crossing the forward/reverse
// boundary) are dropped here exactly like the Python loop.  Outputs
// flattened chains: out_chain_off (n_reads+1, into out_seed_off index
// space), out_seed_off (into the out seed arrays), and the per-chain
// seed lists in insertion order.  Returns the total chain count, or
// -1 if out capacities (n_seeds input size) would overflow (cannot
// happen: output seeds <= input seeds, chains <= seeds).
int64_t bm_chain_batch(int64_t l_pac, int32_t w, int32_t max_chain_gap,
                       int32_t n_reads, const int64_t* read_off,
                       const int64_t* rbeg, const int32_t* qbeg,
                       const int32_t* slen, int64_t* out_chain_off,
                       int64_t* out_seed_off, int64_t* out_rbeg,
                       int32_t* out_qbeg, int32_t* out_len) {
  int64_t n_chain = 0, n_seed = 0;
  std::vector<int64_t> keys;
  std::vector<Chain> chains;
  for (int r = 0; r < n_reads; ++r) {
    out_chain_off[r] = n_chain;
    keys.clear();
    chains.clear();
    for (int64_t k = read_off[r]; k < read_off[r + 1]; ++k) {
      Seed s{rbeg[k], qbeg[k], slen[k]};
      if (s.rbeg < l_pac && l_pac < s.rbeg + s.len)
        continue;  // bridging forward-reverse boundary
      bool to_add = false;
      if (!chains.empty()) {
        // kb_intervalp lower: rightmost chain with pos <= rbeg
        // (bisect_right semantics — equal keys pick the later chain)
        size_t i = std::upper_bound(keys.begin(), keys.end(), s.rbeg) -
                   keys.begin();
        if (i == 0 ||
            !test_and_merge(l_pac, w, max_chain_gap, chains[i - 1], s))
          to_add = true;
      } else {
        to_add = true;
      }
      if (to_add) {
        size_t i = std::upper_bound(keys.begin(), keys.end(), s.rbeg) -
                   keys.begin();
        keys.insert(keys.begin() + i, s.rbeg);
        Chain c;
        c.pos = s.rbeg;
        c.seeds.push_back(s);
        chains.insert(chains.begin() + i, std::move(c));
      }
    }
    for (const Chain& c : chains) {
      out_seed_off[n_chain] = n_seed;
      for (const Seed& s : c.seeds) {
        out_rbeg[n_seed] = s.rbeg;
        out_qbeg[n_seed] = s.qbeg;
        out_len[n_seed] = s.len;
        ++n_seed;
      }
      ++n_chain;
    }
  }
  out_chain_off[n_reads] = n_chain;
  out_seed_off[n_chain] = n_seed;
  return n_chain;
}

}  // extern "C"
