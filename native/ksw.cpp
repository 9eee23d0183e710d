// Native scalar Smith-Waterman kernels for the host-side paths of
// bwamem_tpu: the CPU-fallback/oracle role (wave tails below the
// device dispatch break-even, oversized lanes, and the pure-CPU mode).
//
// Behavioral spec: bwamem_tpu/oracle/ksw.py (itself the transcription
// of the reference SW surface, software/ksw.c:110-585).  The three
// entry points return bit-identical results to the Python oracle:
//
//   bm_ksw_extend2  banded extension, z-drop + end-bonus + gscore
//   bm_ksw_global2  banded global alignment + BAM-encoded CIGAR
//   bm_ksw_align2   local SW emulating the striped kernels' virtual
//                   -padding and u8-saturation semantics
//
// All arithmetic is int32 (the value ranges never approach overflow:
// scores are O(read length * match score), the -inf sentinel is
// -2^30 and band decays subtract only O(qlen * gap_ext)).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t kMinusInf = -0x40000000;
constexpr int kAlphabet = 5;  // A C G T N

inline int32_t imax2(int32_t a, int32_t b) { return a > b ? a : b; }
inline int32_t imin2(int32_t a, int32_t b) { return a < b ? a : b; }

}  // namespace

extern "C" {

// out6 = {best, qle, tle, gtle, gscore, max_off}
void bm_ksw_extend2(int qlen, const uint8_t* query, int tlen,
                    const uint8_t* target, const int8_t* mat, int o_del,
                    int e_del, int o_ins, int e_ins, int w, int end_bonus,
                    int zdrop, int h0, int32_t* out6) {
  if (h0 < 0) h0 = 0;
  const int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;

  // profile[c][j] = mat[c*5 + query[j]]
  std::vector<int8_t> prof(static_cast<size_t>(kAlphabet) * qlen);
  for (int c = 0; c < kAlphabet; ++c)
    for (int j = 0; j < qlen; ++j)
      prof[static_cast<size_t>(c) * qlen + j] = mat[c * kAlphabet + query[j]];

  // row state: hh[j] = H(i-1, j-1), ee[j] = E(i, j)
  std::vector<int32_t> hh(qlen + 2, 0), ee(qlen + 2, 0);
  hh[0] = h0;
  if (qlen >= 1) {
    hh[1] = h0 > oe_ins ? h0 - oe_ins : 0;
    for (int j = 2; j <= qlen && hh[j - 1] > e_ins; ++j)
      hh[j] = hh[j - 1] - e_ins;
  }

  // clamp the band to the gap count that could still score positive
  // (float math matches the C doubles of the spec)
  int max_sc = 0;
  for (int k = 0; k < kAlphabet * kAlphabet; ++k)
    if (mat[k] > max_sc) max_sc = mat[k];
  int cap = static_cast<int>(
      static_cast<double>(qlen * max_sc + end_bonus - o_ins) / e_ins + 1.);
  if (cap < 1) cap = 1;
  if (w > cap) w = cap;
  cap = static_cast<int>(
      static_cast<double>(qlen * max_sc + end_bonus - o_del) / e_del + 1.);
  if (cap < 1) cap = 1;
  if (w > cap) w = cap;

  int32_t best = h0, gscore = -1;
  int best_i = -1, best_j = -1, best_ie = -1, max_off = 0;
  int beg = 0, end = qlen;
  for (int i = 0; i < tlen; ++i) {
    const int8_t* q = prof.data() + static_cast<size_t>(target[i]) * qlen;
    int32_t f = 0, row_max = 0;
    int row_mj = -1;
    int32_t h1 = h0 - (o_del + e_del * (i + 1));
    if (h1 < 0) h1 = 0;
    if (beg < i - w) beg = i - w;
    if (end > i + w + 1) end = i + w + 1;
    if (end > qlen) end = qlen;
    int j = beg;
    for (; j < end; ++j) {
      // invariant: hh[j]=H(i-1,j-1), ee[j]=E(i,j), f=F(i,j), h1=H(i,j-1)
      int32_t h = hh[j], e = ee[j];
      hh[j] = h1;
      h += q[j];
      h = imax2(h, e);
      h = imax2(h, f);
      h1 = h;
      row_mj = row_max > h ? row_mj : j;  // later index wins ties
      row_max = imax2(row_max, h);
      int32_t t = imax2(h - oe_del, 0);
      e = imax2(e - e_del, t);
      ee[j] = e;
      t = imax2(h - oe_ins, 0);
      f = imax2(f - e_ins, t);
    }
    hh[end] = h1;
    ee[end] = 0;
    if (j == qlen) {  // the row reached the query end: track gscore
      if (gscore <= h1) {
        best_ie = i;
        gscore = h1;
      }
    }
    if (row_max == 0) break;
    if (row_max > best) {
      best = row_max;
      best_i = i;
      best_j = row_mj;
      int off = row_mj > i ? row_mj - i : i - row_mj;
      if (off > max_off) max_off = off;
    } else if (zdrop > 0) {
      if (i - best_i > row_mj - best_j) {
        if (best - row_max - ((i - best_i) - (row_mj - best_j)) * e_del >
            zdrop)
          break;
      } else {
        if (best - row_max - ((row_mj - best_j) - (i - best_i)) * e_ins >
            zdrop)
          break;
      }
    }
    // shrink the band to the nonzero neighborhood of the row max
    for (j = row_mj; j >= beg && hh[j] != 0; --j) {
    }
    beg = j + 1;
    for (j = row_mj + 2; j <= end && hh[j] != 0; ++j) {
    }
    end = j;
  }
  out6[0] = best;
  out6[1] = best_j + 1;
  out6[2] = best_i + 1;
  out6[3] = best_ie + 1;
  out6[4] = gscore;
  out6[5] = max_off;
}

// Banded global alignment.  Writes up to qlen+tlen BAM-encoded ops into
// out_cigar (caller-sized), count into *n_cigar; returns the score.
int32_t bm_ksw_global2(int qlen, const uint8_t* query, int tlen,
                       const uint8_t* target, const int8_t* mat, int o_del,
                       int e_del, int o_ins, int e_ins, int w,
                       int want_cigar, uint32_t* out_cigar,
                       int32_t* n_cigar) {
  const int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  if (n_cigar) *n_cigar = 0;
  const int n_col = qlen < 2 * w + 1 ? qlen : 2 * w + 1;

  std::vector<int8_t> prof(static_cast<size_t>(kAlphabet) * qlen);
  for (int c = 0; c < kAlphabet; ++c)
    for (int j = 0; j < qlen; ++j)
      prof[static_cast<size_t>(c) * qlen + j] = mat[c * kAlphabet + query[j]];

  std::vector<uint8_t> z;  // per-cell direction nibbles: f<<4 | e<<2 | h
  if (want_cigar) z.resize(static_cast<size_t>(n_col) * tlen);

  std::vector<int32_t> hh(qlen + 2, kMinusInf), ee(qlen + 2, kMinusInf);
  hh[0] = 0;
  for (int j = 1; j <= qlen && j <= w; ++j) hh[j] = -(o_ins + e_ins * j);

  for (int i = 0; i < tlen; ++i) {
    const int8_t* q = prof.data() + static_cast<size_t>(target[i]) * qlen;
    uint8_t* zi = want_cigar ? z.data() + static_cast<size_t>(i) * n_col
                             : nullptr;
    int beg = i > w ? i - w : 0;
    int end = i + w + 1 < qlen ? i + w + 1 : qlen;
    int32_t f = kMinusInf;
    int32_t h1 = beg == 0 ? -(o_del + e_del * (i + 1)) : kMinusInf;
    for (int j = beg; j < end; ++j) {
      // the M term must stay separate so the e/f direction bits compare
      // against M, not H (spec: oracle/ksw.py ksw_global2)
      int32_t m = hh[j], e = ee[j];
      hh[j] = h1;
      m += q[j];
      uint8_t d = m >= e ? 0 : 1;
      int32_t h = m >= e ? m : e;
      d = h >= f ? d : 2;
      h = h >= f ? h : f;
      h1 = h;
      int32_t t = m - oe_del;
      e -= e_del;
      d |= e > t ? 1 << 2 : 0;
      e = e > t ? e : t;
      ee[j] = e;
      t = m - oe_ins;
      f -= e_ins;
      d |= f > t ? 2 << 4 : 0;
      f = f > t ? f : t;
      if (zi) zi[j - beg] = d;
    }
    hh[end] = h1;
    ee[end] = kMinusInf;
  }
  int32_t score = hh[qlen];

  if (want_cigar && out_cigar && n_cigar) {
    int n = 0;
    auto push = [&](int op, int len) {
      if (n == 0 || op != static_cast<int>(out_cigar[n - 1] & 0xF))
        out_cigar[n++] = static_cast<uint32_t>(len) << 4 | op;
      else
        out_cigar[n - 1] += static_cast<uint32_t>(len) << 4;
    };
    int i = tlen - 1;
    int k = (i + w + 1 < qlen ? i + w + 1 : qlen) - 1;
    int which = 0;
    while (i >= 0 && k >= 0) {
      int off = i > w ? i - w : 0;
      which = (z[static_cast<size_t>(i) * n_col + (k - off)] >>
               (which << 1)) & 3;
      if (which == 0) {
        push(0, 1);
        --i;
        --k;
      } else if (which == 1) {
        push(2, 1);
        --i;
      } else {
        push(1, 1);
        --k;
      }
    }
    if (i >= 0) push(2, i + 1);
    if (k >= 0) push(1, k + 1);
    for (int a = 0, b = n - 1; a < b; ++a, --b) {
      uint32_t tmp = out_cigar[a];
      out_cigar[a] = out_cigar[b];
      out_cigar[b] = tmp;
    }
    *n_cigar = n;
  }
  return score;
}

namespace {

constexpr int kXByte = 0x10000;
constexpr int kXStop = 0x20000;
constexpr int kXSubo = 0x40000;
constexpr int kXStart = 0x80000;

struct KswResult {
  int32_t score = 0, te = -1, qe = -1, score2 = -1, te2 = -1, tb = -1,
          qb = -1;
};

// Local SW over the VIRTUAL query of the striped kernels: the query is
// padded to slen*p positions whose profile scores are 0; the padding
// participates in row maxima and the second-best bookkeeping, and u8
// mode (size=1) clamps the diagonal sum into [0, 255-shift] exactly
// like the saturating epu8 adds (spec: oracle/ksw.py _ksw_core).
KswResult ksw_core(int qlen, const uint8_t* query, int tlen,
                   const uint8_t* target, const int8_t* mat, int o_del,
                   int e_del, int o_ins, int e_ins, int xtra, int size) {
  KswResult r;
  const int p = 8 * (3 - size);          // SIMD lanes being emulated
  const int slen = (qlen + p - 1) / p;   // segment length
  const int vlen = slen * p;             // virtual query length
  int shift = 0, max_sc = 0;
  for (int k = 0; k < kAlphabet * kAlphabet; ++k) {
    if (mat[k] > max_sc) max_sc = mat[k];
    if (size == 1 && -mat[k] > shift) shift = -mat[k];
  }
  const int32_t minsc = (xtra & kXSubo) ? (xtra & 0xFFFF) : 0x10000;
  const int32_t endsc = (xtra & kXStop) ? (xtra & 0xFFFF) : 0x10000;
  const int32_t sat = 255 - shift;
  const int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;

  std::vector<int32_t> prof(static_cast<size_t>(kAlphabet) * vlen, 0);
  for (int c = 0; c < kAlphabet; ++c)
    for (int j = 0; j < qlen; ++j)
      prof[static_cast<size_t>(c) * vlen + j] = mat[c * kAlphabet + query[j]];

  std::vector<int32_t> H(vlen, 0), E(vlen, 0), Hmax(vlen, 0), G(vlen, 0);
  int32_t gmax = 0;
  int te = -1;
  // candidate rows for the second-best score: (row_max, row) runs
  std::vector<std::pair<int32_t, int>> b;

  for (int i = 0; i < tlen; ++i) {
    const int32_t* q = prof.data() + static_cast<size_t>(target[i]) * vlen;
    // G(j) = max(clamp(H(i-1,j-1) + S), E(i,j))
    int32_t hprev = 0;
    for (int j = 0; j < vlen; ++j) {
      int32_t g = hprev + q[j];
      hprev = H[j];
      if (size == 1) {
        if (g > sat) g = sat;
        if (g < 0) g = 0;
      }
      G[j] = imax2(g, E[j]);
    }
    // F scan then H; E update uses the NEW H
    int32_t f = 0, imax = 0;
    for (int j = 0; j < vlen; ++j) {
      int32_t h = imax2(G[j], f);
      H[j] = h;
      if (h > imax) imax = h;
      E[j] = imax2(E[j] - e_del, imax2(h - oe_del, 0));
      f = imax2(f - e_ins, imax2(G[j] - oe_ins, 0));
    }
    if (imax >= minsc) {
      if (b.empty() || b.back().second + 1 != i)
        b.emplace_back(imax, i);
      else if (b.back().first < imax)
        b.back() = {imax, i};
    }
    if (imax > gmax) {
      gmax = imax;
      te = i;
      std::memcpy(Hmax.data(), H.data(), sizeof(int32_t) * vlen);
      if (size == 1 && gmax + shift >= 255) break;
      if (gmax >= endsc) break;
    }
  }

  r.score = (size != 1 || gmax + shift < 255) ? gmax : 255;
  r.te = te;
  if (size != 1 || r.score != 255) {
    int32_t mx = -1;
    if (vlen > 0) {
      mx = Hmax[0];
      for (int j = 1; j < vlen; ++j)
        if (Hmax[j] > mx) mx = Hmax[j];
    }
    if (mx > -1) {
      for (int j = 0; j < vlen; ++j)
        if (Hmax[j] == mx) {
          r.qe = j;
          break;
        }
    }
    if (!b.empty()) {
      int ii = (r.score + max_sc - 1) / max_sc;
      int low = te - ii, high = te + ii;
      for (const auto& cand : b) {
        if ((cand.second < low || cand.second > high) &&
            cand.first > r.score2) {
          r.score2 = cand.first;
          r.te2 = cand.second;
        }
      }
    }
  }
  return r;
}

}  // namespace

// out7 = {score, te, qe, score2, te2, tb, qb}
void bm_ksw_align2(int qlen, const uint8_t* query, int tlen,
                   const uint8_t* target, const int8_t* mat, int o_del,
                   int e_del, int o_ins, int e_ins, int xtra,
                   int32_t* out7) {
  const int size = (xtra & kXByte) ? 1 : 2;
  KswResult r = ksw_core(qlen, query, tlen, target, mat, o_del, e_del, o_ins,
                         e_ins, xtra, size);
  if ((xtra & kXStart) != 0 &&
      !((xtra & kXSubo) && r.score < (xtra & 0xFFFF))) {
    // locate the start by rerunning on the reversed prefixes with an
    // early stop at the known score
    std::vector<uint8_t> rq(r.qe + 1), rt(r.te + 1);
    for (int j = 0; j <= r.qe; ++j) rq[j] = query[r.qe - j];
    for (int j = 0; j <= r.te; ++j) rt[j] = target[r.te - j];
    KswResult rr = ksw_core(r.qe + 1, rq.data(), r.te + 1, rt.data(), mat,
                            o_del, e_del, o_ins, e_ins, kXStop | r.score,
                            size);
    if (r.score == rr.score) {
      r.tb = r.te - rr.te;
      r.qb = r.qe - rr.qe;
    }
  }
  out7[0] = r.score;
  out7[1] = r.te;
  out7[2] = r.qe;
  out7[3] = r.score2;
  out7[4] = r.te2;
  out7[5] = r.tb;
  out7[6] = r.qb;
}

}  // extern "C"
