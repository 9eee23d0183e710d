// Native host-oracle SMEM search + SA lookup.
//
// The reference's CPU fallback for rejected accelerator batches is C
// (bwt_forward/backward_search_batched, software/bwt.c:299-414, the
// exact spec of the FPGA kernel); ours was pure Python
// (bwamem_tpu/oracle/smem.py, fmindex.py) — fine for parity tests,
// but ~40 ms per read when a fallback actually fires (oversize reads,
// interval-buffer overflow lanes, straggler tails).  This is the same
// algorithm at C speed: bwt_smem1's bidirectional search
// (software/bwt.c:776-835) over the occ-interleaved index, and
// bwt_sa's inverse-Psi walk (software/bwt.c:104-114).
//
// Exact-semantics twin of FmIndex.{occ,occ4,extend,sa_lookup} and
// oracle.smem.smem1 — parity-fuzzed in tests/test_native_hostsmem.py.

#include <cstdint>
#include <vector>

namespace {

struct Fm {
    const uint32_t* bwt;  // occ-interleaved array
    int64_t primary;
    const int64_t* L2;    // 5 entries
    int64_t seq_len;
};

static uint32_t CNT_TABLE[256];
static bool cnt_init = false;

static void init_cnt() {
    if (cnt_init) return;
    for (int i = 0; i < 256; i++) {
        uint32_t x = 0;
        for (int j = 0; j < 4; j++) {
            int c = ((i & 3) == j) + (((i >> 2) & 3) == j) +
                    (((i >> 4) & 3) == j) + ((i >> 6) == j);
            x |= (uint32_t)c << (j << 3);
        }
        CNT_TABLE[i] = x;
    }
    cnt_init = true;
}

static inline uint32_t occ_aux4(uint32_t b) {
    return CNT_TABLE[b & 0xFF] + CNT_TABLE[(b >> 8) & 0xFF] +
           CNT_TABLE[(b >> 16) & 0xFF] + CNT_TABLE[b >> 24];
}

static inline int64_t occ_aux64(uint64_t y, int c) {
    uint64_t m = (c & 2) ? y : ~y;
    m = (m >> 1) & ((c & 1) ? y : ~y) & 0x5555555555555555ull;
    return (int64_t)__builtin_popcountll(m);
}

// bwt_B0 (software/bwt.h:72-78)
static inline int B0(const Fm& f, int64_t k) {
    uint32_t w = f.bwt[((k >> 7) << 4) + 8 + ((k & 0x7F) >> 4)];
    return (int)(w >> (((~k) & 0xF) << 1)) & 3;
}

// bwt_occ4 (software/bwt.c:187-204)
static void occ4(const Fm& f, int64_t k, int64_t cnt[4]) {
    if (k == -1) { cnt[0] = cnt[1] = cnt[2] = cnt[3] = 0; return; }
    k -= (k >= f.primary) ? 1 : 0;
    int64_t base = (k >> 7) << 4;
    const uint64_t* ck = (const uint64_t*)(f.bwt + base);
    for (int c = 0; c < 4; c++) cnt[c] = (int64_t)ck[c];
    const uint32_t* words = f.bwt + base + 8;
    int64_t n_words = (k >> 4) - ((k & ~(int64_t)0x7F) >> 4);
    uint32_t x = 0;
    for (int64_t w = 0; w < n_words; w++) x += occ_aux4(words[w]);
    uint32_t tmp = words[n_words] &
        (uint32_t)(~((1ull << ((((~k) & 15)) << 1)) - 1));
    x += occ_aux4(tmp) - (uint32_t)((~k) & 15);
    cnt[0] += x & 0xFF;
    cnt[1] += (x >> 8) & 0xFF;
    cnt[2] += (x >> 16) & 0xFF;
    cnt[3] += (x >> 24) & 0xFF;
}

// bwt_occ (software/bwt.c:125-147)
static int64_t occ1(const Fm& f, int64_t k, int c) {
    if (k == f.seq_len) return f.L2[c + 1] - f.L2[c];
    if (k == -1) return 0;
    k -= (k >= f.primary) ? 1 : 0;
    int64_t base = (k >> 7) << 4;
    const uint64_t* ck = (const uint64_t*)(f.bwt + base);
    int64_t n = (int64_t)ck[c];
    const uint32_t* words = f.bwt + base + 8;
    int64_t n_groups = (k >> 5) - ((k & ~(int64_t)0x7F) >> 5);
    for (int64_t g = 0; g < n_groups; g++) {
        uint64_t y = ((uint64_t)words[2 * g] << 32) | words[2 * g + 1];
        n += occ_aux64(y, c);
    }
    uint64_t y = ((uint64_t)words[2 * n_groups] << 32)
                 | words[2 * n_groups + 1];
    y &= ~((1ull << ((((~k) & 31)) << 1)) - 1);
    n += occ_aux64(y, c);
    if (c == 0) n -= (~k) & 31;
    return n;
}

struct Iv { int64_t x0, x1, s, info; };

// bwt_extend (software/bwt.c:416-429); matches FmIndex.extend
static void extend(const Fm& f, const Iv& ik, int is_back, Iv ok[4]) {
    int64_t fwd = is_back ? ik.x0 : ik.x1;
    int64_t tk[4], tl[4];
    occ4(f, fwd - 1, tk);
    occ4(f, fwd - 1 + ik.s, tl);
    for (int c = 0; c < 4; c++) {
        ok[c].info = ik.info;
        if (is_back) ok[c].x0 = f.L2[c] + 1 + tk[c];
        else ok[c].x1 = f.L2[c] + 1 + tk[c];
        ok[c].s = tl[c] - tk[c];
    }
    int bump = (fwd <= f.primary && fwd + ik.s - 1 >= f.primary) ? 1 : 0;
    int64_t prev = (is_back ? ik.x1 : ik.x0) + bump;
    if (is_back) {
        ok[3].x1 = prev;
        ok[2].x1 = ok[3].x1 + ok[3].s;
        ok[1].x1 = ok[2].x1 + ok[2].s;
        ok[0].x1 = ok[1].x1 + ok[1].s;
    } else {
        ok[3].x0 = prev;
        ok[2].x0 = ok[3].x0 + ok[3].s;
        ok[1].x0 = ok[2].x0 + ok[2].s;
        ok[0].x0 = ok[1].x0 + ok[1].s;
    }
}

}  // namespace

extern "C" {

// smem1 (oracle/smem.py:26-77; bwt_smem1 software/bwt.c:776-835).
// out: n*4 int64 (x0, x1, s, info) rows, caller-sized to 4*(qlen+1).
// Returns n_mem; *ret_out = next iterator start.
int32_t bt_smem1(const uint32_t* bwt, int64_t primary, const int64_t* L2,
                 int64_t seq_len, const uint8_t* q, int32_t qlen,
                 int32_t x, int64_t min_intv, int64_t* out,
                 int32_t* ret_out) {
    init_cnt();
    Fm f{bwt, primary, L2, seq_len};
    if (q[x] > 3) { *ret_out = x + 1; return 0; }
    if (min_intv < 1) min_intv = 1;

    Iv ik{L2[q[x]] + 1, L2[3 - q[x]] + 1, L2[q[x] + 1] - L2[q[x]],
          (int64_t)x + 1};
    std::vector<Iv> curr, prev, mem;
    Iv ok[4];

    int32_t i = x + 1;
    for (; i < qlen; i++) {  // forward extension
        if (q[i] < 4) {
            int c = 3 - q[i];
            extend(f, ik, 0, ok);
            if (ok[c].s != ik.s) {
                curr.push_back(ik);
                if (ok[c].s < min_intv) break;
            }
            ik = Iv{ok[c].x0, ok[c].x1, ok[c].s, (int64_t)i + 1};
        } else {
            curr.push_back(ik);
            break;
        }
    }
    if (i == qlen) curr.push_back(ik);
    // longest matches (smallest intervals) first
    prev.assign(curr.rbegin(), curr.rend());
    int32_t ret = (int32_t)prev[0].info;

    for (int32_t j = x - 1; j >= -1; j--) {  // backward extension
        int c = (j < 0 || q[j] > 3) ? -1 : q[j];
        curr.clear();
        for (const Iv& p : prev) {
            extend(f, p, 1, ok);
            if (c < 0 || ok[c].s < min_intv) {
                if (curr.empty()) {
                    if (mem.empty() ||
                        (int64_t)j + 1 < (mem.back().info >> 32)) {
                        mem.push_back(Iv{p.x0, p.x1, p.s,
                                         p.info | ((int64_t)(j + 1)
                                                   << 32)});
                    }
                }
            } else if (curr.empty() || ok[c].s != curr.back().s) {
                curr.push_back(Iv{ok[c].x0, ok[c].x1, ok[c].s, p.info});
            }
        }
        if (curr.empty()) break;
        prev.swap(curr);
    }
    int32_t n = (int32_t)mem.size();
    for (int32_t k = 0; k < n; k++) {  // reverse: by start coordinate
        const Iv& p = mem[n - 1 - k];
        out[4 * k] = p.x0;
        out[4 * k + 1] = p.x1;
        out[4 * k + 2] = p.s;
        out[4 * k + 3] = p.info;
    }
    *ret_out = ret;
    return n;
}

// bwt_sa for a batch of rows (software/bwt.c:104-114): inverse-Psi
// walk to the previous sampled row.  sa = sampled array (int64),
// sa[0] == -1 by construction.
void bt_sa_lookup_batch(const uint32_t* bwt, int64_t primary,
                        const int64_t* L2, int64_t seq_len,
                        const int64_t* sa, int64_t sa_intv,
                        const int64_t* ks, int64_t n, int64_t* out) {
    init_cnt();
    Fm f{bwt, primary, L2, seq_len};
    int64_t mask = sa_intv - 1;
    for (int64_t i = 0; i < n; i++) {
        int64_t k = ks[i], add = 0;
        while (k & mask) {
            add++;
            // bwt_invPsi (software/bwt.c:71-77)
            int64_t x = k - (k > f.primary ? 1 : 0);
            int c = B0(f, x);
            x = f.L2[c] + occ1(f, k, c);
            k = (k == f.primary) ? 0 : x;
        }
        out[i] = add + sa[k / sa_intv];
    }
}

// int32 sampled-SA variant (the native index builder keeps samples in
// the SA's own dtype — int32 under 2^31 — to halve resident footprint)
void bt_sa_lookup_batch32(const uint32_t* bwt, int64_t primary,
                          const int64_t* L2, int64_t seq_len,
                          const int32_t* sa, int64_t sa_intv,
                          const int64_t* ks, int64_t n, int64_t* out) {
    init_cnt();
    Fm f{bwt, primary, L2, seq_len};
    int64_t mask = sa_intv - 1;
    for (int64_t i = 0; i < n; i++) {
        int64_t k = ks[i], add = 0;
        while (k & mask) {
            add++;
            int64_t x = k - (k > f.primary ? 1 : 0);
            int c = B0(f, x);
            x = f.L2[c] + occ1(f, k, c);
            k = (k == f.primary) ? 0 : x;
        }
        out[i] = add + (int64_t)sa[k / sa_intv];
    }
}

}  // extern "C"
