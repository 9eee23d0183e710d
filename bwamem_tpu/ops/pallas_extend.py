"""Pallas TPU kernel for the banded Smith-Waterman extension DP.

Same semantics as ops.ksw._extend_impl (the batched ksw_extend2,
software/ksw.c:379-477) but with the whole row loop INSIDE one Mosaic
kernel: the band state (eh_h/eh_e) lives in registers/VMEM for the
kernel's lifetime, so a DP row costs a handful of fused vector ops
instead of dozens of XLA-scheduled slice/pad/select HLOs (measured
10.25 ms per 512-lane wave on the XLA path — ~30x off roofline).

Layout: everything is TRANSPOSED relative to the XLA kernel — query
positions j run along sublanes and lanes run along the 128-wide lane
axis, so
  * the per-row target character is a [1, BLK] row that broadcasts
    over j for free,
  * the horizontal F-dependency prefix max-scan is log2(LQ) sublane
    shifts,
  * per-lane scalars (beg/end/best/...) are [1, BLK] rows.

The grid walks lane-blocks of BLK sequentially; each block's row loop
exits at its own max live target length, so the engine's size-sorted
lane grouping (ops/engine.py) lets short blocks finish after a few
rows.

Scoring matrix arrives as a (1, 32) int32 SMEM block read as scalars;
o_del/e_del/o_ins/e_ins/zdrop are trace-time constants.
"""


import os

import numpy as np

import jax
import jax.experimental
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# np scalars: python int literals inside kernel jnp.where/clip become
# weak i64[] consts under x64, which Mosaic cannot lower
NEG = np.int32(-0x40000000)
Z = np.int32(0)
ONE = np.int32(1)

BLK = int(os.environ.get("BWAMEM_TPU_PALLAS_EXT_BLK", "128"))


def extend_pallas_available() -> bool:
    return _HAVE_PALLAS


def _cummax_sublanes(a, L1, blk):
    """Inclusive running max along the sublane (j) axis."""
    sh = 1
    while sh < L1:
        top = jnp.full((min(sh, L1), blk), NEG, jnp.int32)
        a = jnp.maximum(a, jnp.concatenate(
            [top, a[:L1 - sh, :]], axis=0)[:L1, :])
        sh *= 2
    return a


def _make_kernel(LQ, LT, blk, o_del, e_del, o_ins, e_ins, zdrop):
    i32 = jnp.int32
    L1 = LQ + 1
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    def kernel(mat_ref, qt_ref, tt_ref, par_ref, out_ref):
        qlen = par_ref[0:1, :]
        tlen = par_ref[1:2, :]
        w = par_ref[2:3, :]
        h0 = par_ref[3:4, :]
        done0 = par_ref[4:5, :]    # int32 0/1: Mosaic cannot carry
                                   # i1 vectors through scf loops

        jv = lax.broadcasted_iota(i32, (L1, blk), 0)
        q = jnp.concatenate(
            [qt_ref[:, :], jnp.full((1, blk), 4, i32)], axis=0)

        # per-row score profiles prof[c][j,b] = mat[c, q[j,b]]
        prof = []
        for c in range(5):
            pc = jnp.zeros((L1, blk), i32)
            for qv in range(5):
                pc = pc + jnp.where(q == qv, mat_ref[0, c * 5 + qv],
                                    i32(0))
            prof.append(pc)

        # eh init (ksw.c:390-396)
        eh_h = jnp.where(jv == 0, h0,
                         jnp.maximum(h0 - oe_ins - (jv - 1) * e_ins, Z))
        eh_h = jnp.where(jv <= qlen, eh_h, Z).astype(i32)
        eh_e = jnp.zeros((L1, blk), i32)

        st0 = (jnp.int32(0), eh_h, eh_e,
               jnp.zeros((1, blk), i32), qlen,            # beg, end
               h0,                                         # best
               jnp.full((1, blk), -1, i32),                # max_i
               jnp.full((1, blk), -1, i32),                # max_j
               jnp.full((1, blk), -1, i32),                # max_ie
               jnp.full((1, blk), -1, i32),                # gscore
               jnp.zeros((1, blk), i32),                   # max_off
               done0.astype(i32))

        def cond(st):
            i, done_c = st[0], st[-1]
            alive = (done_c == 0) & (i < tlen)
            return jnp.max(jnp.where(alive, ONE, Z)) > 0

        def body(st):
            (i, eh_h, eh_e, beg_st, end_st, best, max_i, max_j,
             max_ie, gscore, max_off, done_c) = st
            done = done_c != 0
            alive = (~done) & (i < tlen)
            h1 = jnp.maximum(h0 - (o_del + e_del * (i + 1)), Z)
            beg = jnp.maximum(beg_st, i - w)
            end = jnp.minimum(jnp.minimum(end_st, i + w + 1), qlen)
            degen = beg >= end
            run = alive & ~degen

            tch = tt_ref[pl.ds(i, 1), :]                  # [1, blk]
            qp = jnp.zeros((L1, blk), i32)
            for c in range(5):
                qp = qp + jnp.where(tch == c, prof[c], i32(0))
            band = (jv >= beg) & (jv < end)

            e = eh_e
            g = jnp.where(band, eh_h + qp, NEG)
            g = jnp.maximum(g, jnp.where(band, e, NEG))
            a_vec = jnp.where(band, g + jv * e_ins, NEG)
            cm = _cummax_sublanes(a_vec, L1, blk)
            cm_prev = jnp.concatenate(
                [jnp.full((1, blk), NEG, i32), cm[:L1 - 1, :]], axis=0)
            f = jnp.maximum(cm_prev - oe_ins - (jv - 1) * e_ins, Z)
            f = jnp.where(jv == beg, Z, f)
            h = jnp.maximum(g, f)
            h = jnp.where(band, h, Z)

            mrow = jnp.max(h, axis=0, keepdims=True)
            hit = band & (h >= mrow) & (mrow > 0)
            mj = jnp.max(jnp.where(hit, jv, np.int32(-1)), axis=0, keepdims=True)
            mj = jnp.where(mrow > 0, mj, end - 1)

            t_ = jnp.maximum(h - oe_del, Z)
            new_e = jnp.maximum(e - e_del, t_)
            eh_e_n = jnp.where(band & run, new_e, eh_e)
            eh_e_n = jnp.where(run & (jv == end), Z, eh_e_n)

            h_shift = jnp.concatenate(
                [jnp.zeros((1, blk), i32), h[:L1 - 1, :]], axis=0)
            store = (jv >= beg + 1) & (jv <= end)
            eh_h_n = jnp.where(store, h_shift, eh_h)
            eh_h_n = jnp.where(jv == beg, h1, eh_h_n)
            eh_h_n = jnp.where(run, eh_h_n, eh_h)
            eh_e_n = jnp.where(run, eh_e_n, eh_e)

            lastj = jnp.clip(end - 1, Z, np.int32(LQ - 1))
            h1_last = jnp.sum(jnp.where(jv == lastj, h, Z), axis=0,
                              keepdims=True, dtype=i32)
            at_q_end = run & (end == qlen)
            g_upd = at_q_end & (gscore <= h1_last)
            # degenerate band: C's empty inner row still applies the
            # j==qlen gscore update with the first-column h1 before its
            # m==0 break (software/ksw.c:450-456)
            g_upd_d = alive & degen & (beg == qlen) & (gscore <= h1)
            max_ie = jnp.where(g_upd | g_upd_d, i, max_ie)
            gscore = jnp.where(g_upd, h1_last,
                               jnp.where(g_upd_d, h1, gscore))

            zero_brk = run & (mrow == 0)
            improved = run & ~zero_brk & (mrow > best)
            best_n = jnp.where(improved, mrow, best)
            max_i_n = jnp.where(improved, i, max_i)
            max_j_n = jnp.where(improved, mj, max_j)
            off = jnp.abs(mj - i)
            max_off = jnp.where(improved & (max_off < off), off, max_off)
            di = i - max_i
            dj = mj - max_j
            zd = jnp.where(di > dj,
                           best - mrow - (di - dj) * e_del,
                           best - mrow - (dj - di) * e_ins)
            z_brk = (run & ~zero_brk & ~improved & (zd > zdrop)
                     if zdrop > 0 else jnp.zeros((1, blk), bool))

            done_n = done | (alive & degen) | zero_brk | z_brk \
                | (~alive & ~done)
            cont = run & ~zero_brk & ~z_brk

            z0 = eh_h_n == 0
            lowz = z0 & (jv >= beg) & (jv <= mj)
            beg_new = jnp.max(jnp.where(lowz, jv, beg - 1), axis=0,
                              keepdims=True) + 1
            hiz = z0 & (jv >= mj + 2) & (jv <= end)
            first_hi = jnp.min(jnp.where(hiz, jv, np.int32(LQ + 2)), axis=0,
                               keepdims=True)
            end_cap = jnp.maximum(mj + 2, end + 1)
            end_new = jnp.minimum(first_hi, end_cap)

            return (i + 1, eh_h_n, eh_e_n,
                    jnp.where(cont, beg_new, beg),
                    jnp.where(cont, end_new, end),
                    best_n, max_i_n, max_j_n, max_ie, gscore, max_off,
                    jnp.where(done_n, ONE, Z))

        st = lax.while_loop(cond, body, st0)
        (_, _, _, _, _, best, max_i, max_j, max_ie, gscore, max_off,
         _) = st
        out_ref[0:1, :] = best
        out_ref[1:2, :] = max_j + 1
        out_ref[2:3, :] = max_i + 1
        out_ref[3:4, :] = max_ie + 1
        out_ref[4:5, :] = gscore
        out_ref[5:6, :] = max_off
        out_ref[6:8, :] = jnp.zeros((2, blk), i32)

    return kernel

    # NOTE: the global row counter replaces the XLA kernel's per-lane
    # i: a lane's i only stops advancing once the lane is done, so the
    # two are equivalent on every live row.


def extend_pallas(query, target, qlen, tlen, mat, o_del, e_del, o_ins,
                  e_ins, w, zdrop, h0, done0, LQ: int, LT: int,
                  pre_t: bool = False):
    """Pallas twin of the ops.ksw row loop.  `w` is the already-clamped
    per-lane band (int32[B]); `done0` bool[B] masks lanes off entirely.
    Returns (best, max_j, max_i, max_ie, gscore, max_off), raw (the
    caller applies the +1 offsets — matching _extend_impl's returns
    means max_j+1 etc; here we return the shifted values directly).
    """
    B = query.shape[1] if pre_t else query.shape[0]
    i32 = jnp.int32
    blk = min(BLK, B)
    pad = (-B) % blk
    if pad:
        def padb(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)],
                axis=0)

        def padl(a, fill=0):  # lane-axis pad for pre-transposed rows
            return jnp.concatenate(
                [a, jnp.full(a.shape[:1] + (pad,), fill, a.dtype)],
                axis=1)
        if pre_t:
            query, target = padl(query, 4), padl(target, 4)
        else:
            query, target = padb(query, 4), padb(target, 4)
        qlen, tlen, w, h0 = map(padb, (qlen, tlen, w, h0))
        done0 = padb(done0, True)
    Bp = B + pad

    if pre_t:
        qt = query.astype(i32)                   # already [LQ, Bp]
        tt = target.astype(i32)
    else:
        qt = query.astype(i32).T                 # [LQ, Bp]
        tt = target.astype(i32).T                # [LT, Bp]
    params = jnp.stack([qlen, tlen, w, h0,
                        done0.astype(i32)]).astype(i32)   # [5, Bp]
    mat_pad = jnp.zeros(32, i32).at[:25].set(mat.astype(i32))[None, :]

    kernel = _make_kernel(LQ, LT, blk, int(o_del), int(e_del),
                          int(o_ins), int(e_ins), int(zdrop))
    interpret = jax.default_backend() != "tpu"
    # trace the kernel with x64 disabled: under x64 the BlockSpec index
    # maps (and stray literals) become i64, which Mosaic cannot legalize
    with jax.enable_x64(False):
        out = _call(kernel, mat_pad, qt, tt, params, Bp, blk, LQ, LT,
                    interpret)
    out = out[:, :B]
    return (out[0], out[1], out[2], out[3], out[4], out[5])


def _call(kernel, mat_pad, qt, tt, params, Bp, blk, LQ, LT, interpret):
    i32 = jnp.int32
    return pl.pallas_call(
        kernel,
        grid=(Bp // blk,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((LQ, blk), lambda b: (0, b)),
            pl.BlockSpec((LT, blk), lambda b: (0, b)),
            pl.BlockSpec((5, blk), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((8, blk), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((8, Bp), i32),
        interpret=interpret,
    )(mat_pad, qt, tt, params)
