// Bounded-memory suffix-array / BWT construction for large genomes.
//
// The reference switches to an incremental constant-memory BWT builder
// for big genomes (software/bwtindex.c:239 -> software/bwt_gen.c); the
// BWT is a canonical function of the text, so we are free to use a
// different linear-time algorithm as long as the artifacts come out
// byte-identical.  This is SA-IS (induced sorting), ~4.5 bytes/char
// peak for texts under 2^31 chars (int32 indices; int64 above that):
// a 1 Gbp genome (2 Gbp doubled text) indexes in ~12 GB RAM, vs
// ~50 bytes/char for the NumPy prefix-doubling path
// (bwamem_tpu/index/suffix_array.py).
//
// Layout tricks are the standard SA-IS ones: the reduced problem's
// text lives in the tail of the SA buffer and its SA in the head, so
// recursion allocates only its type bit-vector and bucket counters.
//
// Exported C ABI (ctypes, see bwamem_tpu/index/nsa.py):
//   bt_sais_bases_{32,64} SA of a 0..3 byte text (+implicit sentinel)
//   bt_bwt_from_sa{32,64} BWT string + primary from text+SA
//   bt_interleave_occ    occ-checkpoint interleaving (bwtindex.c:128-150)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// type bit-vector: 1 = S-type, 0 = L-type
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

// level-0 text accessor: bases shifted +1 with the sentinel 0 at
// position n — avoids materializing a second n-byte text copy
struct ShiftedBases {
    const uint8_t* b;
    int64_t n;
    inline int32_t operator[](int64_t i) const {
        return i == n ? 0 : b[i] + 1;
    }
};

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

template <class I>
static inline bool is_lms(const TypeBits& t, I i) {
    return i > 0 && t.get(i) && !t.get(i - 1);
}

// induce L-type then S-type suffixes from the LMS (or sorted-LMS) seeds
template <class TXT, class I>
static void induce(TXT s, I* SA, I m, I K, const TypeBits& t,
                   std::vector<I>& bkt) {
    // L-type: left-to-right scan, bucket heads
    bucket_bounds<TXT, I>(s, m, K, bkt, false);
    for (I i = 0; i < m; i++) {
        I j = SA[i];
        if (j > 0 && !t.get(j - 1)) SA[bkt[(size_t)s[j - 1]]++] = j - 1;
    }
    // S-type: right-to-left scan, bucket tails
    bucket_bounds<TXT, I>(s, m, K, bkt, true);
    for (I i = m - 1; i >= 0; i--) {
        I j = SA[i];
        if (j > 0 && t.get(j - 1)) SA[--bkt[(size_t)s[j - 1]]] = j - 1;
    }
}

// SA-IS core.  s[0..m-1] with s[m-1] the unique smallest sentinel (0);
// values < K; s is any indexable text accessor.  SA buffer of length m.
template <class TXT, class I>
static void sais(TXT s, I* SA, I m, I K) {
    const I EMPTY = (I)-1;
    if (m == 1) { SA[0] = 0; return; }
    TypeBits t(m);
    t.set(m - 1, true);
    for (I i = m - 2; i >= 0; i--)
        t.set(i, s[i] < s[i + 1] || (s[i] == s[i + 1] && t.get(i + 1)));

    std::vector<I> bkt((size_t)K);

    // stage 1: sort LMS substrings by one induced pass over LMS seeds
    for (I i = 0; i < m; i++) SA[i] = EMPTY;
    bucket_bounds<TXT, I>(s, m, K, bkt, true);
    for (I i = m - 1; i > 0; i--)
        if (is_lms<I>(t, i)) SA[--bkt[(size_t)s[i]]] = i;
    induce<TXT, I>(s, SA, m, K, t, bkt);

    // compact the sorted LMS positions into SA[0..n1)
    I n1 = 0;
    for (I i = 0; i < m; i++)
        if (is_lms<I>(t, SA[i])) SA[n1++] = SA[i];

    // name LMS substrings in SA[n1..m) (sparse, indexed by pos/2)
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
                break;  // both substrings ended equal
        }
        if (diff) { name++; prev = pos; }
        SA[n1 + (pos >> 1)] = name - 1;
    }
    // compact names into s1 = SA[m-n1..m)
    for (I i = m - 1, j = m - 1; i >= n1; i--)
        if (SA[i] != EMPTY) SA[j--] = SA[i];
    I* s1 = SA + (m - n1);

    if (name < n1) {
        sais<const I*, I>(s1, SA, n1, name);
    } else {
        for (I i = 0; i < n1; i++) SA[s1[i]] = i;
    }

    // stage 2: rebuild LMS position list (left-to-right) into s1,
    // translate SA1 ranks to text positions, induce the final SA
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

template <class I>
static int64_t bwt_from_sa(const uint8_t* bases, const I* sa, int64_t n,
                           uint8_t* bwt) {
    // sa has n+1 rows (sentinel row first); drop the rank of suffix 0
    // and emit bases[sa[r]-1] for the rest (is_bwt, software/is.c:207-223)
    int64_t primary = -1, w = 0;
    for (int64_t r = 0; r <= n; r++) {
        I v = sa[r];
        if (v == 0) { primary = r; continue; }
        bwt[w++] = bases[v - 1];
    }
    return primary;
}

}  // namespace

extern "C" {

// SA of bases (values 0..3) of length n plus the implicit sentinel:
// SA buffer has n+1 slots; SA[0] == n on return.  The +1 alphabet
// shift and the sentinel are applied by the accessor — no text copy.
int bt_sais_bases_32(const uint8_t* bases, int32_t n, int32_t* SA) {
    if (n < 0) return -1;
    sais<ShiftedBases, int32_t>(ShiftedBases{bases, n}, SA, n + 1, 5);
    return 0;
}

int bt_sais_bases_64(const uint8_t* bases, int64_t n, int64_t* SA) {
    if (n < 0) return -1;
    sais<ShiftedBases, int64_t>(ShiftedBases{bases, n}, SA, n + 1, 5);
    return 0;
}

int64_t bt_bwt_from_sa32(const uint8_t* bases, const int32_t* sa,
                         int64_t n, uint8_t* bwt) {
    return bwt_from_sa<int32_t>(bases, sa, n, bwt);
}

int64_t bt_bwt_from_sa64(const uint8_t* bases, const int64_t* sa,
                         int64_t n, uint8_t* bwt) {
    return bwt_from_sa<int64_t>(bases, sa, n, bwt);
}

// occ-interleaved uint32 array from the raw BWT string: every 128 bases
// a 4xuint64 checkpoint then 8 words of 2-bit packed BWT, plus a
// closing checkpoint (bwt_bwtupdate_core, software/bwtindex.c:128-150).
// out_len must equal (n+15)/16 + ((n+127)/128 + 1) * 8.
int64_t bt_interleave_occ(const uint8_t* bwt, int64_t n, uint32_t* out,
                          int64_t out_len) {
    int64_t n_words = (n + 15) >> 4;
    int64_t n_blocks = (n + 127) >> 7;
    if (out_len != n_words + (n_blocks + 1) * 8) return -1;
    uint64_t cnt[4] = {0, 0, 0, 0};
    int64_t pos = 0, i = 0;
    for (int64_t b = 0; b <= n_blocks; b++) {
        std::memcpy(out + pos, cnt, 32);
        pos += 8;
        if (b == n_blocks) break;
        int64_t stop = i + 128 < n ? i + 128 : n;
        uint32_t word = 0;
        int fill = 0;
        while (i < stop) {
            uint8_t c = bwt[i++];
            cnt[c]++;
            word = (word << 2) | c;
            if (++fill == 16) { out[pos++] = word; word = 0; fill = 0; }
        }
        if (fill) out[pos++] = word << ((16 - fill) << 1);
    }
    return pos;
}

}  // extern "C"
