// Streaming bounded-memory BWT construction (bwt_gen.c's role).
//
// The reference builds human-scale BWTs incrementally in bounded
// memory (software/bwtindex.c:239 -> software/bwt_gen.c,
// BWTIncConstructFromPacked); our whole-text SA-IS builder
// (saindex.cpp) is fast but peaks at ~11 B/char (66.7 GB at 3 Gbp).
// This module rebuilds the same artifacts byte-identically in
// O(block) + O(bwt) memory (~1.7 B/char peak, <=12 GB at 3 Gbp):
//
//   For text T[0..N) processed in blocks from the END, maintain the
//   interleaved BWT (the exact .bwt occ-checkpoint layout,
//   bwtindex.c:128-150) of the current suffix S_j = T[j..N).  To
//   prepend block T[i..j):
//     1. right-to-left rank recursion: a_p = #(suffixes of S_j,
//        incl. the empty one) < T[p..] via one occ query each:
//        a_p = 1 + L2[c] + occ_lt(c, a_{p+1}) (backward-search step,
//        software/bwt.c:125-147 semantics);
//     2. the block's suffixes sort among themselves as the suffix
//        array of the key sequence K_p = (c_p, 2*a_{p+1} + old_p):
//        a_* is monotone in suffix order, equal-a ties recurse into
//        the successor keys, and a new-vs-S_j tie is broken by the
//        old flag (a new suffix in S_j's gap is smaller) — so plain
//        SA-IS over dense-named keys is exact and never compares
//        into the old text;
//     3. one streaming merge: new suffix with block rank r inserts at
//        row a_p + r; the old hole (S_j's row) becomes T[j-1]; the
//        new hole is S_i's row (the next `primary`).
//   The first increment runs the same code against an empty BWT.
//
// The sampled SA (.sa/.sa8) is recovered afterwards by the standard
// inverse-Psi walk over the finished BWT (bwt_cal_sa,
// software/bwt.c:80-102): N sequential LF steps recording positions
// at sampled rows.
//
// The text is never materialized: a 2-bit accessor serves the doubled
// forward+reverse-complement sequence straight from the .pac bytes
// (software/bntseq.c pack layout), 0.125 B/char resident.
//
// Exported C ABI (ctypes, bwamem_tpu/index/nsa.py):
//   bti_build_bwt   pac -> interleaved BWT (+primary), streaming
//   bti_sa_walk     interleaved BWT -> dense SA sample (intv 8)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

// SA-IS core lives in saindex.cpp's anonymous namespace; a tiny
// standalone re-instantiation here would duplicate it, so the shared
// template is included from a header-style fragment instead.
namespace btinc {

// ---- SA-IS over an int32 name string (values >=1, sentinel 0) ------
// (Same induced-sorting algorithm as saindex.cpp, instantiated for
// the block's key names; kept local to this TU.)
struct TypeBits {
    std::vector<uint64_t> w;
    explicit TypeBits(int64_t n) : w((size_t)((n + 63) >> 6), 0) {}
    inline bool get(int64_t i) const {
        return (w[(size_t)(i >> 6)] >> (i & 63)) & 1u;
    }
    inline void set(int64_t i, bool v) {
        uint64_t m = 1ull << (i & 63);
        if (v) w[(size_t)(i >> 6)] |= m; else w[(size_t)(i >> 6)] &= ~m;
    }
};

template <class I>
static inline bool is_lms(const TypeBits& t, I i) {
    return i > 0 && t.get(i) && !t.get(i - 1);
}

template <class TXT, class I>
static void bucket_bounds(TXT s, I m, I K, std::vector<I>& bkt,
                          bool end) {
    std::fill(bkt.begin(), bkt.end(), (I)0);
    for (I i = 0; i < m; i++) bkt[(size_t)s[i]]++;
    I sum = 0;
    for (I c = 0; c < K; c++) {
        sum += bkt[(size_t)c];
        bkt[(size_t)c] = end ? sum : sum - bkt[(size_t)c];
    }
}

template <class TXT, class I>
static void induce(TXT s, I* SA, I m, I K, const TypeBits& t,
                   std::vector<I>& bkt) {
    bucket_bounds<TXT, I>(s, m, K, bkt, false);
    for (I i = 0; i < m; i++) {
        I j = SA[i];
        if (j > 0 && !t.get(j - 1)) SA[bkt[(size_t)s[j - 1]]++] = j - 1;
    }
    bucket_bounds<TXT, I>(s, m, K, bkt, true);
    for (I i = m - 1; i >= 0; i--) {
        I j = SA[i];
        if (j > 0 && t.get(j - 1)) SA[--bkt[(size_t)s[j - 1]]] = j - 1;
    }
}

template <class TXT, class I>
static void sais(TXT s, I* SA, I m, I K) {
    const I EMPTY = (I)-1;
    if (m == 1) { SA[0] = 0; return; }
    TypeBits t(m);
    t.set(m - 1, true);
    for (I i = m - 2; i >= 0; i--)
        t.set(i, s[i] < s[i + 1] || (s[i] == s[i + 1] && t.get(i + 1)));

    std::vector<I> bkt((size_t)K);
    for (I i = 0; i < m; i++) SA[i] = EMPTY;
    bucket_bounds<TXT, I>(s, m, K, bkt, true);
    for (I i = m - 1; i > 0; i--)
        if (is_lms<I>(t, i)) SA[--bkt[(size_t)s[i]]] = i;
    induce<TXT, I>(s, SA, m, K, t, bkt);

    I n1 = 0;
    for (I i = 0; i < m; i++)
        if (is_lms<I>(t, SA[i])) SA[n1++] = SA[i];

    for (I i = n1; i < m; i++) SA[i] = EMPTY;
    I name = 0, prev = EMPTY;
    for (I i = 0; i < n1; i++) {
        I pos = SA[i];
        bool diff = false;
        for (I d = 0; d < m; d++) {
            if (prev == EMPTY || s[pos + d] != s[prev + d] ||
                t.get(pos + d) != t.get(prev + d)) {
                diff = true;
                break;
            }
            if (d > 0 && (is_lms<I>(t, pos + d) ||
                          is_lms<I>(t, prev + d)))
                break;
        }
        if (diff) { name++; prev = pos; }
        SA[n1 + (pos >> 1)] = name - 1;
    }
    for (I i = m - 1, j = m - 1; i >= n1; i--)
        if (SA[i] != EMPTY) SA[j--] = SA[i];
    I* s1 = SA + (m - n1);

    if (name < n1) {
        sais<const I*, I>(s1, SA, n1, name);
    } else {
        for (I i = 0; i < n1; i++) SA[s1[i]] = i;
    }

    for (I i = 1, j = 0; i < m; i++)
        if (is_lms<I>(t, i)) s1[j++] = i;
    for (I i = 0; i < n1; i++) SA[i] = s1[SA[i]];
    for (I i = n1; i < m; i++) SA[i] = EMPTY;
    bucket_bounds<TXT, I>(s, m, K, bkt, true);
    for (I i = n1 - 1; i >= 0; i--) {
        I j = SA[i];
        SA[i] = EMPTY;
        SA[--bkt[(size_t)s[j]]] = j;
    }
    induce<TXT, I>(s, SA, m, K, t, bkt);
}

// ---- doubled-text accessor over the forward .pac ---------------------
// pac byte i>>2 holds base i at shift ((~i & 3) << 1) (bntseq.c
// layout); the doubled text is fwd ++ revcomp(fwd).
struct DoubledPac {
    const uint8_t* pac;
    int64_t l;                          // forward length
    inline int c(int64_t i) const {
        int64_t p = i < l ? i : 2 * l - 1 - i;
        int b = (pac[p >> 2] >> ((~p & 3) << 1)) & 3;
        return i < l ? b : 3 - b;
    }
};

// ---- interleaved-BWT rank structure (the .bwt artifact layout) -----
// words: per 128 chars, 8 words checkpoint (4 x u64 LE) + 8 words of
// 2-bit big-endian-packed chars, plus one closing checkpoint.
struct IBwt {
    uint32_t* w = nullptr;       // interleaved array (caller-owned)
    int64_t n = 0;               // hole-removed char count
    int64_t primary = 0;         // conceptual row of the full text
    int64_t cnt_lt[5] = {0, 0, 0, 0, 0};  // L2: #chars < c

    static int64_t words_for(int64_t n) {
        return ((n + 15) >> 4) + (((n + 127) >> 7) + 1) * 8;
    }

    static inline int64_t occ_aux64(uint64_t y, int c) {
        y = ((c & 2) ? y : ~y) >> 1 & ((c & 1) ? y : ~y)
            & 0x5555555555555555ull;
        return __builtin_popcountll(y);
    }

    // count of char c among the first k hole-removed chars, k in [0, n]
    inline int64_t count_lt(int c, int64_t k) const {
        if (k <= 0) return 0;
        int64_t kk = k - 1;              // count positions [0, kk]
        const uint32_t* blk = w + ((kk >> 7) << 4);
        uint64_t ck;
        std::memcpy(&ck, blk + 2 * c, 8);
        int64_t nn = (int64_t)ck;
        const uint32_t* words = blk + 8;
        int64_t g = ((kk & 127) >> 5);
        for (int64_t q = 0; q < g; q++) {
            uint64_t y = ((uint64_t)words[2 * q] << 32) | words[2 * q + 1];
            nn += occ_aux64(y, c);
        }
        uint64_t y = ((uint64_t)words[2 * g] << 32) | words[2 * g + 1];
        y &= ~((1ull << ((~kk & 31) << 1)) - 1);
        nn += occ_aux64(y, c);
        if (c == 0) nn -= ~kk & 31;      // masked fields counted as 0
        return nn;
    }

    // #chars == c among conceptual rows < r (hole never counted)
    inline int64_t occ_lt(int c, int64_t r) const {
        return count_lt(c, r - (r > primary ? 1 : 0));
    }

    // char at hole-removed position k
    inline int b0(int64_t k) const {
        uint32_t word = w[((k >> 7) << 4) + 8 + ((k & 0x7F) >> 4)];
        return (word >> ((~k & 0xF) << 1)) & 3;
    }
};

// streaming writer of the interleaved layout (bt_interleave_occ's
// loop, fed one char at a time)
struct IWriter {
    uint32_t* out;
    uint64_t cnt[4] = {0, 0, 0, 0};
    int64_t pos = 0, nchars = 0;
    uint32_t word = 0;
    int fill = 0;

    inline void put(int c) {
        if ((nchars & 127) == 0) flush_ck();
        cnt[c]++;
        word = (word << 2) | (uint32_t)c;
        nchars++;
        if (++fill == 16) { out[pos++] = word; word = 0; fill = 0; }
    }
    inline void flush_ck() {
        std::memcpy(out + pos, cnt, 32);
        pos += 8;
    }
    void finish() {
        if (fill) { out[pos++] = word << ((16 - fill) << 1); fill = 0; }
        flush_ck();
    }
};

// sequential reader of hole-removed chars from an IBwt
struct IReader {
    const uint32_t* w;
    int64_t i = 0;
    uint32_t word = 0;
    inline int next() {
        if ((i & 15) == 0)
            word = w[((i >> 7) << 4) + 8 + ((i & 0x7F) >> 4)];
        int c = (word >> ((~i & 0xF) << 1)) & 3;
        i++;
        return c;
    }
};

}  // namespace btinc

extern "C" {

// Build the interleaved BWT of the doubled (fwd + revcomp) text from
// the forward pac, in increments of block_chars, writing the final
// artifact into out (words_for(2*l_pac) uint32s).  Returns primary
// (>= 0) or -1 on error.  Peak transient memory: one extra interleaved
// buffer (0.5 B/char) + ~24 B/block_char.
int64_t bti_build_bwt(const uint8_t* pac, int64_t l_pac,
                      int64_t block_chars, uint32_t* out,
                      int64_t out_len) {
    using namespace btinc;
    const int64_t N = 2 * l_pac;
    if (out_len != IBwt::words_for(N) || block_chars < 1) return -1;
    DoubledPac T{pac, l_pac};

    // ping-pong buffers; arrange parity so the LAST merge lands in out
    int64_t n_inc = (N + block_chars - 1) / block_chars;
    if (n_inc == 0) n_inc = 1;
    std::vector<uint32_t> alt((size_t)out_len);
    uint32_t* bufs[2] = {out, alt.data()};
    int cur = (n_inc % 2 == 0) ? 0 : 1;  // after n_inc swaps end at out

    IBwt old_b;
    old_b.w = bufs[cur];
    old_b.n = 0;
    old_b.primary = 0;
    {   // empty BWT: single closing checkpoint
        IWriter wr{bufs[cur]};
        wr.finish();
    }

    std::vector<int64_t> a;      // a_p ranks, block-local
    std::vector<int64_t> keys;
    std::vector<int32_t> names;
    std::vector<int32_t> bsa;

    int64_t j = N;
    while (j > 0) {
        int64_t i = j - block_chars > 0 ? j - block_chars : 0;
        int64_t m = j - i;

        // ---- 1. rank recursion (right-to-left backward search) ----
        a.assign((size_t)m, 0);
        keys.assign((size_t)m, 0);
        int64_t a_succ = old_b.primary;   // a(S_j) = its own row
        int64_t r_succ = 2 * a_succ + 1;  // old flag
        for (int64_t p = j - 1; p >= i; p--) {
            int c = T.c(p);
            int64_t ap = 1 + old_b.cnt_lt[c] + old_b.occ_lt(c, a_succ);
            a[(size_t)(p - i)] = ap;
            keys[(size_t)(p - i)] = ((int64_t)c << 36) | r_succ;
            a_succ = ap;
            r_succ = 2 * ap;              // new suffix: flag 0
        }

        // ---- 2. dense-name the keys, SA-IS the name string --------
        {
            std::vector<int64_t> sorted(keys);
            std::sort(sorted.begin(), sorted.end());
            sorted.erase(std::unique(sorted.begin(), sorted.end()),
                         sorted.end());
            names.assign((size_t)(m + 1), 0);
            for (int64_t p = 0; p < m; p++)
                names[(size_t)p] = 1 + (int32_t)(std::lower_bound(
                    sorted.begin(), sorted.end(), keys[(size_t)p])
                    - sorted.begin());
            bsa.assign((size_t)(m + 1), 0);
            int32_t K = (int32_t)sorted.size() + 1;
            sais<const int32_t*, int32_t>(names.data(), bsa.data(),
                                          (int32_t)(m + 1), K);
        }

        // ---- 3. streaming merge into the other buffer -------------
        int nxt = cur ^ 1;
        IWriter wr{bufs[nxt]};
        IReader rd{old_b.w};
        int64_t new_primary = -1;
        int64_t emitted_old = 0;          // conceptual old rows emitted
        int64_t row = 0;                  // merged conceptual row
        int last_new_char = T.c(j - 1);   // replaces the old hole
        for (int64_t r = 1; r <= m; r++) {  // bsa[0] is the sentinel
            int64_t p = i + bsa[(size_t)r];
            int64_t t_row = a[(size_t)(p - i)] + (r - 1);
            // copy old conceptual rows until t_row new position
            while (emitted_old < t_row - (r - 1)) {
                if (emitted_old == old_b.primary && old_b.n + 1 >
                    emitted_old) {
                    // old hole: S_j's row, now preceded by T[j-1]
                    wr.put(last_new_char);
                } else {
                    wr.put(rd.next());
                }
                emitted_old++;
                row++;
            }
            if (p == i) {
                new_primary = row;        // S_i's row: the new hole
            } else {
                wr.put(T.c(p - 1));
            }
            row++;
        }
        while (emitted_old < old_b.n + 1) {
            if (emitted_old == old_b.primary) wr.put(last_new_char);
            else wr.put(rd.next());
            emitted_old++;
            row++;
        }
        wr.finish();
        if (new_primary < 0) return -2;

        for (int64_t p = i; p < j; p++) {
            int c = T.c(p);
            for (int cc = c + 1; cc <= 4; cc++) old_b.cnt_lt[cc]++;
        }
        old_b.w = bufs[nxt];
        old_b.n += m;
        old_b.primary = new_primary;
        cur = nxt;
        j = i;
    }
    if (bufs[cur] != out) return -3;      // parity arranged above
    return old_b.primary;
}

// Inverse-Psi walk over a finished interleaved BWT: fills the dense
// SA sample sa8[k] = SA[8k] for k in [0, (n+8)/8) with sa8[0] = -1
// (bwt_cal_sa's role, software/bwt.c:80-102).  cnt_lt = L2[0..4].
int64_t bti_sa_walk(const uint32_t* w, int64_t n, int64_t primary,
                    const int64_t* cnt_lt, int64_t* sa8,
                    int64_t n_sa8) {
    using namespace btinc;
    if (n_sa8 != (n + 8) / 8) return -1;
    IBwt b;
    b.w = const_cast<uint32_t*>(w);
    b.n = n;
    b.primary = primary;
    int64_t k = 0, pos = n;
    for (int64_t step = 0; step < n; step++) {
        // bwt_invPsi (software/bwt.c:71-77)
        int64_t x = k - (k > primary ? 1 : 0);
        int c = b.b0(x);
        // occ(k, c) counts rows <= k: rows < k+1
        k = (k == primary) ? 0 : cnt_lt[c] + b.occ_lt(c, k + 1);
        pos--;
        if ((k & 7) == 0) sa8[k >> 3] = pos;
    }
    sa8[0] = -1;
    return 0;
}

}  // extern "C"
