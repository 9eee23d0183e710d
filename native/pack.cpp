// Native extension-wave packer for bwamem_tpu: chains -> per-seed
// device-lane rows for the speculative fused left+right extension wave,
// plus scalar results for lanes that exceed the device caps.
//
// Behavioral spec: bwamem_tpu/core/region.py chain_rmax_rseq +
// seed_lr_request (the slicing of software/bwamem.c:1052-1160) and
// core/swdrive.py extend_seed_lr (the band-doubling serial logic the
// device kernel reproduces; used here verbatim for oversize lanes via
// the native scalar extend2).
//
// Rows are written 4-bit packed (two bases per byte, pad base 4 ->
// 0x44) exactly as ops/engine._pack4 would produce, so the Python side
// only gathers rows (numpy fancy indexing) and dispatches.

#include <cstddef>
#include <cstdint>
#include <vector>

#include "common.h"

extern "C" {
// from ksw.cpp
void bm_ksw_extend2(int qlen, const uint8_t* query, int tlen,
                    const uint8_t* target, const int8_t* mat, int o_del,
                    int e_del, int o_ins, int e_ins, int w, int end_bonus,
                    int zdrop, int h0, int32_t* out6);
}

namespace {

constexpr int kMaxBandTry = 2;  // bwamem.c:38

struct ExtOut {
  int32_t score, truesc, qb, qe, aw0, aw1;
  int64_t rb, re;
};

// extend_seed_lr (spec: core/swdrive.py): one seed's ENTIRE left+right
// extension including the x2 band-doubling retries, on the scalar
// native extend2 — the CPU-fallback twin of ksw_extend_lr_batched.
ExtOut extend_seed_lr_scalar(const int8_t* mat, int a_sc, int o_del,
                             int e_del, int o_ins, int e_ins, int w0,
                             int pen_clip5, int pen_clip3, int zdrop,
                             const std::vector<uint8_t>& qs,
                             const std::vector<uint8_t>& rs,
                             const std::vector<uint8_t>& qrt,
                             const std::vector<uint8_t>& rrt,
                             int32_t sc_seed, int32_t s_qbeg,
                             int64_t s_rbeg, int64_t rmax0, int32_t l_query,
                             int32_t s_len) {
  ExtOut o{};
  int32_t score = -1, truesc = -1;
  int aw0 = w0, aw1 = w0;
  int64_t qb, rb;
  if (!qs.empty()) {  // left
    int32_t r6[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < kMaxBandTry; ++i) {
      int32_t prev = score;
      aw0 = w0 << i;
      bm_ksw_extend2(static_cast<int>(qs.size()), qs.data(),
                     static_cast<int>(rs.size()), rs.data(), mat, o_del,
                     e_del, o_ins, e_ins, aw0, pen_clip5, zdrop, sc_seed,
                     r6);
      score = r6[0];
      if (score == prev || r6[5] < (aw0 >> 1) + (aw0 >> 2)) break;
    }
    int32_t gscore = r6[4];
    if (gscore <= 0 || gscore <= score - pen_clip5) {
      qb = s_qbeg - r6[1];
      rb = s_rbeg - r6[2];
      truesc = score;
    } else {
      qb = 0;
      rb = s_rbeg - r6[3];
      truesc = gscore;
    }
  } else {
    score = truesc = sc_seed;
    qb = 0;
    rb = s_rbeg;
  }
  int64_t qe, re;
  if (!qrt.empty()) {  // right
    int32_t sc0 = score;
    int64_t qe0 = l_query - static_cast<int64_t>(qrt.size());
    int32_t r6[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < kMaxBandTry; ++i) {
      int32_t prev = score;
      aw1 = w0 << i;
      bm_ksw_extend2(static_cast<int>(qrt.size()), qrt.data(),
                     static_cast<int>(rrt.size()), rrt.data(), mat, o_del,
                     e_del, o_ins, e_ins, aw1, pen_clip3, zdrop, sc0, r6);
      score = r6[0];
      if (score == prev || r6[5] < (aw1 >> 1) + (aw1 >> 2)) break;
    }
    int64_t re0 = s_rbeg + s_len - rmax0;
    int32_t gscore = r6[4];
    if (gscore <= 0 || gscore <= score - pen_clip3) {
      qe = qe0 + r6[1];
      re = rmax0 + re0 + r6[2];
      truesc += score - sc0;
    } else {
      qe = l_query;
      re = rmax0 + re0 + r6[3];
      truesc += gscore - sc0;
    }
  } else {
    qe = l_query;
    re = s_rbeg + s_len;
  }
  o.score = score;
  o.truesc = truesc;
  o.qb = static_cast<int32_t>(qb);
  o.rb = rb;
  o.qe = static_cast<int32_t>(qe);
  o.re = re;
  o.aw0 = aw0;
  o.aw1 = aw1;
  return o;
}

// write a 4-bit-packed row: out[j] = b[2j] | b[2j+1]<<4 with pad 4
void pack_row(const uint8_t* b, int n, int width, int8_t* out) {
  int half = width >> 1;
  for (int j = 0; j < half; ++j) {
    int i0 = 2 * j, i1 = 2 * j + 1;
    uint8_t b0 = i0 < n ? b[i0] : 4;
    uint8_t b1 = i1 < n ? b[i1] : 4;
    out[j] = static_cast<int8_t>(b0 | (b1 << 4));
  }
}

}  // namespace

extern "C" {

// Pack every seed's fused-extension request.  For seeds within the
// device caps (LQ/LT_max) the four 4-bit-packed rows land at
// seed_index * row stride in lq_pk/lt_pk/rq_pk/rt_pk and served[k]=0;
// oversize seeds are extended here on the scalar native kernels and
// their results written to the r_* arrays with served[k]=1.
void bm_pack_extlr(
    // scoring
    const int8_t* mat, int32_t a, int32_t o_del, int32_t e_del,
    int32_t o_ins, int32_t e_ins, int32_t w, int32_t pen_clip5,
    int32_t pen_clip3, int32_t zdrop,
    // device caps; force_scalar=1 computes EVERY seed on the scalar
    // kernels (the reference's USE_SW_VERIFY role: a full software
    // twin of the device wave for comparison)
    int32_t LQ, int32_t LT_max, int32_t force_scalar,
    // reference
    int64_t l_pac, const uint8_t* pac,
    // reads
    const uint8_t* seqs, const int64_t* seq_off,
    // chains flattened over the whole chunk
    int64_t n_chains, const int32_t* chain_read, const int64_t* seed_off,
    const int64_t* s_rbeg, const int32_t* s_qbeg, const int32_t* s_len,
    // per-seed outputs
    uint8_t* served, int32_t* lt_need,  // max(llt, rlt) for grouping
    int32_t* o_llq, int32_t* o_llt, int32_t* o_rlq, int32_t* o_rlt,
    int32_t* o_scs, int32_t* o_sqb, int64_t* o_srb, int64_t* o_rmax0,
    int32_t* o_lqv, int32_t* o_slv,
    int8_t* lq_pk, int8_t* lt_pk, int8_t* rq_pk, int8_t* rt_pk,
    // scalar-served results
    int32_t* r_score, int32_t* r_truesc, int32_t* r_qb, int64_t* r_rb,
    int32_t* r_qe, int64_t* r_re, int32_t* r_aw0, int32_t* r_aw1) {
  const int lq_half = LQ >> 1, lt_half = LT_max >> 1;
  // chains are independent and write disjoint per-seed slots
  bm_parallel_for(static_cast<int>(n_chains), 32, [&](int ci) {
    const int64_t c = ci;
    std::vector<uint8_t> qs, rs, qrt, rrt;
    const int r = chain_read[c];
    const uint8_t* query = seqs + seq_off[r];
    const int l_query = static_cast<int>(seq_off[r + 1] - seq_off[r]);
    // chain window (spec: core/region.py chain_rmax_rseq)
    int64_t rmax0 = l_pac << 1, rmax1 = 0;
    for (int64_t k = seed_off[c]; k < seed_off[c + 1]; ++k) {
      int64_t b = s_rbeg[k] -
                  (s_qbeg[k] + bm::cal_max_gap(a, o_del, e_del, o_ins,
                                               e_ins, w, s_qbeg[k]));
      int rem = l_query - s_qbeg[k] - s_len[k];
      int64_t e = s_rbeg[k] + s_len[k] + rem +
                  bm::cal_max_gap(a, o_del, e_del, o_ins, e_ins, w, rem);
      if (b < rmax0) rmax0 = b;
      if (e > rmax1) rmax1 = e;
    }
    if (rmax0 < 0) rmax0 = 0;
    if (rmax1 > l_pac << 1) rmax1 = l_pac << 1;
    if (rmax0 < l_pac && l_pac < rmax1) {
      if (s_rbeg[seed_off[c]] < l_pac)
        rmax1 = l_pac;
      else
        rmax0 = l_pac;
    }
    std::vector<uint8_t> rseq = bm::get_seq(l_pac, pac, rmax0, rmax1);

    for (int64_t k = seed_off[c]; k < seed_off[c + 1]; ++k) {
      const int32_t qb0 = s_qbeg[k];
      const int32_t ln = s_len[k];
      const int64_t rb0 = s_rbeg[k];
      // request slices (spec: core/region.py seed_lr_request)
      qs.clear();
      rs.clear();
      qrt.clear();
      rrt.clear();
      if (qb0) {
        qs.assign(qb0, 0);
        for (int j = 0; j < qb0; ++j) qs[j] = query[qb0 - 1 - j];
        int64_t tmp = rb0 - rmax0;
        if (tmp > 0) {
          rs.assign(static_cast<size_t>(tmp), 0);
          for (int64_t j = 0; j < tmp; ++j)
            rs[static_cast<size_t>(j)] = rseq[static_cast<size_t>(
                tmp - 1 - j)];
        }
      }
      if (qb0 + ln != l_query) {
        int32_t qe0 = qb0 + ln;
        int64_t re0 = rb0 + ln - rmax0;
        qrt.assign(query + qe0, query + l_query);
        rrt.assign(rseq.begin() + static_cast<size_t>(re0), rseq.end());
      }
      o_llq[k] = static_cast<int32_t>(qs.size());
      o_llt[k] = static_cast<int32_t>(rs.size());
      o_rlq[k] = static_cast<int32_t>(qrt.size());
      o_rlt[k] = static_cast<int32_t>(rrt.size());
      o_scs[k] = ln * a;
      o_sqb[k] = qb0;
      o_srb[k] = rb0;
      o_rmax0[k] = rmax0;
      o_lqv[k] = l_query;
      o_slv[k] = ln;
      int32_t ltn = o_llt[k] > o_rlt[k] ? o_llt[k] : o_rlt[k];
      lt_need[k] = ltn;
      bool fits = !force_scalar && o_llq[k] <= LQ &&
                  o_llt[k] <= LT_max && o_rlq[k] <= LQ &&
                  o_rlt[k] <= LT_max;
      if (fits) {
        served[k] = 0;
        pack_row(qs.data(), static_cast<int>(qs.size()), LQ,
                 lq_pk + k * lq_half);
        pack_row(rs.data(), static_cast<int>(rs.size()), LT_max,
                 lt_pk + k * lt_half);
        pack_row(qrt.data(), static_cast<int>(qrt.size()), LQ,
                 rq_pk + k * lq_half);
        pack_row(rrt.data(), static_cast<int>(rrt.size()), LT_max,
                 rt_pk + k * lt_half);
      } else {
        served[k] = 1;
        ExtOut o = extend_seed_lr_scalar(
            mat, a, o_del, e_del, o_ins, e_ins, w, pen_clip5, pen_clip3,
            zdrop, qs, rs, qrt, rrt, o_scs[k], qb0, rb0, rmax0, l_query,
            ln);
        r_score[k] = o.score;
        r_truesc[k] = o.truesc;
        r_qb[k] = o.qb;
        r_rb[k] = o.rb;
        r_qe[k] = o.qe;
        r_re[k] = o.re;
        r_aw0[k] = o.aw0;
        r_aw1[k] = o.aw1;
      }
    }
  });
}

}  // extern "C"
