"""Pallas TPU kernel for banded global alignment + traceback.

ksw_global2 (software/ksw.c:501-585) with the whole computation in one
Mosaic kernel per lane-block: the row DP uses the same transposed
layout as ops/pallas_extend.py (query positions on sublanes, lanes on
the 128-wide lane axis), and the direction matrix z lives in a VMEM
scratch [LT, LQ, blk] for the in-kernel traceback.

Traceback strategy: the XLA path pays a [B, LT, LQ] masked reduction
PER STEP to read z[i[b], k[b]] (per-lane 2-D select).  Here the walk
runs row-descending behind a single global row cursor gi: every lane's
current row i only decreases, so lanes consume their ops while
cur_i == gi and the row fetch z[gi] is a UNIFORM dynamic slice; only
the per-lane k-select remains a (cheap, [LQ, blk]) masked reduction.
gi decrements once no live lane remains on it.  Iterations =
n_rows + insertion stalls, each touching [LQ, blk] — versus the XLA
path's [B, LT, LQ] per step.  Measured (jitted) 0.25 ms per 1024-lane
wave on v5e vs ~50 ms for the XLA path.  NOTE: calling this wrapper
OUTSIDE jit pays ~15 eager dispatches over the tunnel (~600 ms) —
always call through the jitted ksw_global2_batched.

Returns match ops.ksw.ksw_global2_batched exactly: (score, ops
(reverse order, 0=M 1=I 2=D), n_ops, rem_i, rem_k).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# python-int / np scalars only: jnp consts must not be captured, and
# int literals inside jnp.where become i64 under x64 (see pallas_extend)
NEG = np.int32(-0x40000000)
NEG2 = np.int32(-0x60000000)
Z = np.int32(0)
ONE = np.int32(1)

BLK = int(os.environ.get("BWAMEM_TPU_PALLAS_GLO_BLK", "128"))


def global_pallas_available() -> bool:
    return _HAVE_PALLAS


def _cummax_sublanes(a, L1, blk):
    sh = 1
    while sh < L1:
        top = jnp.full((min(sh, L1), blk), NEG2, jnp.int32)
        a = jnp.maximum(a, jnp.concatenate(
            [top, a[:L1 - sh, :]], axis=0)[:L1, :])
        sh *= 2
    return a


def _make_kernel(LQ, LT, blk, o_del, e_del, o_ins, e_ins):
    i32 = jnp.int32
    L1 = LQ + 1
    MAXOPS = LT + LQ
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    def kernel(mat_ref, qt_ref, tt_ref, par_ref, out_ref, ops_ref,
               z_ref):
        qlen = par_ref[0:1, :]
        tlen = par_ref[1:2, :]
        w = par_ref[2:3, :]

        jv = lax.broadcasted_iota(i32, (L1, blk), 0)
        jq = jv[:LQ, :]
        q = qt_ref[:, :]

        prof = []
        for c in range(5):
            pc = jnp.zeros((LQ, blk), i32)
            for qv in range(5):
                pc = pc + jnp.where(q == qv, mat_ref[0, c * 5 + qv],
                                    i32(0))
            prof.append(pc)

        # init (ksw.c:520-526)
        eh_h = jnp.where(jv == 0, Z,
                         jnp.where((jv >= 1)
                                   & (jv <= jnp.minimum(qlen, w)),
                                   -(o_ins + e_ins * jv), NEG)
                         ).astype(i32)
        eh_e = jnp.full((L1, blk), NEG, i32)

        tmax = jnp.max(tlen)

        def row_body(st):
            i, eh_h, eh_e = st
            run = i < tlen
            beg = jnp.maximum(i - w, Z)
            end = jnp.minimum(i + w + 1, qlen)
            h1 = jnp.where(beg == 0, -(o_del + e_del * (i + 1)), NEG)
            degen = end <= beg
            do = run & ~degen

            tch = tt_ref[pl.ds(i, 1), :]
            qp = jnp.zeros((LQ, blk), i32)
            for c in range(5):
                qp = qp + jnp.where(tch == c, prof[c], i32(0))
            band = (jq >= beg) & (jq < end)

            hdiag = eh_h[:LQ, :]
            e = eh_e[:LQ, :]
            mm = jnp.where(band, hdiag + qp, NEG)
            a_vec = jnp.where(band, mm + jq * e_ins, NEG2)
            cm = _cummax_sublanes(a_vec, LQ, blk)
            cm_prev = jnp.concatenate(
                [jnp.full((1, blk), NEG2, i32), cm[:LQ - 1, :]], axis=0)
            f = jnp.maximum(cm_prev - oe_ins - (jq - 1) * e_ins,
                            NEG - (jq - beg) * e_ins)
            f = jnp.where(jq == beg, NEG, f)

            d = jnp.where(mm >= e, Z, ONE)
            h = jnp.maximum(mm, e)
            d = jnp.where(h >= f, d, np.int32(2))
            h = jnp.maximum(h, f)
            e2 = e - e_del
            t_ = mm - oe_del
            d = d | jnp.where(e2 > t_, np.int32(1 << 2), Z)
            new_e = jnp.maximum(e2, t_)
            f2 = f - e_ins
            t2 = mm - oe_ins
            d = d | jnp.where(f2 > t2, np.int32(2 << 4), Z)

            # full-row store, zeros out-of-band: every cell the XLA
            # path leaves 0 is 0 here too (traceback reads zeros on
            # degenerate rows), and no multi-MB scratch init is needed
            # (a monolithic zeros((LT,LQ,blk)) constant hangs Mosaic).
            # z is a 2-D [LT*LQ, blk] scratch: dynamic SUBLANE slices
            # are fast in Mosaic, dynamic first-axis indexing of a
            # rank-3 scratch costs ~0.2-0.6 ms per access
            dmask = band & do
            z_ref[pl.ds(pl.multiple_of(i * LQ, LQ), LQ), :] = \
                jnp.where(dmask, d, Z)

            eh_e_new = jnp.where(band, new_e, e)
            eh_e_new = jnp.concatenate([eh_e_new, eh_e[LQ:, :]], axis=0)
            eh_e_new = jnp.where(jv == end, NEG, eh_e_new)
            h_shift = jnp.concatenate(
                [jnp.zeros((1, blk), i32), h], axis=0)
            store = (jv >= beg + 1) & (jv <= end)
            eh_h_new = jnp.where(store, h_shift, eh_h)
            eh_h_new = jnp.where(jv == beg, h1, eh_h_new)

            eh_h_deg = jnp.where(jv == end, h1, eh_h)
            eh_e_deg = jnp.where(jv == end, NEG, eh_e)

            eh_h = jnp.where(do, eh_h_new,
                             jnp.where(run & degen, eh_h_deg, eh_h))
            eh_e = jnp.where(do, eh_e_new,
                             jnp.where(run & degen, eh_e_deg, eh_e))
            return i + 1, eh_h, eh_e

        def row_cond(st):
            return st[0] < tmax

        _, eh_h, eh_e = lax.while_loop(
            row_cond, row_body, (jnp.int32(0), eh_h, eh_e))

        score = jnp.sum(jnp.where(jv == qlen, eh_h, Z), axis=0,
                        keepdims=True, dtype=i32)

        # ---- traceback (ksw.c:570-584), row-descending ----
        ops_ref[:, :] = jnp.zeros((MAXOPS, blk), jnp.uint8)
        i0 = tlen - 1
        k0 = jnp.minimum(i0 + w + 1, qlen) - 1
        done0 = jnp.where((i0 < 0) | (k0 < 0), ONE, Z)
        no = lax.broadcasted_iota(i32, (MAXOPS, blk), 0)

        def tb_body(st):
            gi, ci, k, which, n, done_c = st
            done = done_c != 0
            act = ~done & (ci == gi) & (gi >= 0)

            gc = jnp.maximum(gi, jnp.int32(0))
            zrow = z_ref[pl.ds(pl.multiple_of(gc * LQ, LQ), LQ), :]
            kc = jnp.clip(k, Z, np.int32(LQ - 1))
            dcode = jnp.sum(jnp.where(jq == kc, zrow, Z), axis=0,
                            keepdims=True, dtype=i32)
            which_new = jnp.where(
                which == 0, dcode & 3,
                jnp.where(which == 1, (dcode >> 2) & 3,
                          (dcode >> 4) & 3))
            op = jnp.where(which_new == 0, Z,
                           jnp.where(which_new == 1, np.int32(2), ONE))

            # append op at per-lane position n
            sel = act & (no == n)
            ops_ref[:, :] = jnp.where(
                sel, op.astype(jnp.uint8), ops_ref[:, :])

            di = jnp.where(which_new != 2, ONE, Z)
            dk = jnp.where(which_new != 1, ONE, Z)
            ci_n = jnp.where(act, ci - di, ci)
            k_n = jnp.where(act, k - dk, k)
            which_n = jnp.where(act, which_new, which)
            n_n = n + jnp.where(act, ONE, Z)
            done_n = done | (act & ((ci_n < 0) | (k_n < 0)))

            live_here = ~done_n & (ci_n == gi)
            gi_n = jnp.where(jnp.max(jnp.where(live_here, ONE, Z)) > 0,
                             gi, gi - 1)
            return (gi_n, ci_n, k_n, which_n, n_n,
                    jnp.where(done_n, ONE, Z))

        def tb_cond(st):
            done_c = st[-1]
            return jnp.max(jnp.where(done_c == 0, ONE, Z)) > 0

        gi0 = jnp.max(jnp.where(done0 == 0, i0, np.int32(-1)))
        st = lax.while_loop(
            tb_cond, tb_body,
            (gi0, i0, k0, jnp.zeros((1, blk), i32),
             jnp.zeros((1, blk), i32), done0))
        _, ci_f, k_f, _, n_f, _ = st

        out_ref[0:1, :] = score
        out_ref[1:2, :] = n_f
        out_ref[2:3, :] = ci_f
        out_ref[3:4, :] = k_f
        out_ref[4:8, :] = jnp.zeros((4, blk), i32)

    return kernel


def global_pallas(query, target, qlen, tlen, mat, o_del, e_del,
                  o_ins, e_ins, w, LQ: int, LT: int):
    """Pallas twin of ops.ksw.ksw_global2_batched.  Returns
    (score, ops uint8[B, LT+LQ], n_ops, rem_i, rem_k)."""
    B = query.shape[0]
    i32 = jnp.int32
    blk = min(BLK, B)
    pad = (-B) % blk
    if pad:
        def padb(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)],
                axis=0)
        query, target = padb(query, 4), padb(target, 4)
        qlen, tlen, w = map(padb, (qlen, tlen, w))
    Bp = B + pad

    qt = query.astype(i32).T
    tt = target.astype(i32).T
    params = jnp.stack([qlen, tlen, w]).astype(i32)
    mat_pad = jnp.zeros(32, i32).at[:25].set(mat.astype(i32))[None, :]

    kernel = _make_kernel(LQ, LT, blk, int(o_del), int(e_del),
                          int(o_ins), int(e_ins))
    interpret = jax.default_backend() != "tpu"
    MAXOPS = LT + LQ
    with jax.enable_x64(False):
        out, ops = pl.pallas_call(
            kernel,
            grid=(Bp // blk,),
            in_specs=[
                pl.BlockSpec((1, 32), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((LQ, blk), lambda b: (0, b)),
                pl.BlockSpec((LT, blk), lambda b: (0, b)),
                pl.BlockSpec((3, blk), lambda b: (0, b)),
            ],
            out_specs=(pl.BlockSpec((8, blk), lambda b: (0, b)),
                       pl.BlockSpec((MAXOPS, blk), lambda b: (0, b))),
            out_shape=(jax.ShapeDtypeStruct((8, Bp), i32),
                       jax.ShapeDtypeStruct((MAXOPS, Bp), jnp.uint8)),
            scratch_shapes=[pltpu.VMEM((LT * LQ, blk), jnp.int32)],
            interpret=interpret,
        )(mat_pad, qt, tt, params)
    out = out[:, :B]
    return (out[0], ops[:, :B].T, out[1], out[2], out[3])
