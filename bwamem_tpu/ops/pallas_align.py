"""Pallas TPU kernel for batched local Smith-Waterman (ksw_align2).

Same semantics as the XLA row loop in ops/ksw_align.py (the Farrar
striped kernels ksw_u8/ksw_i16, software/ksw.c:110-364, computed over
the equivalent virtual-padded query), with the whole row loop in one
Mosaic kernel — the same transposed layout and VMEM-resident band
state as ops/pallas_extend.py.  Used by the PE mate-rescue and
chain2aln_short waves.

See pallas_extend.py for the Mosaic gotchas this file obeys (np.int32
literals, i32 loop carries, x64-disabled tracing).
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

NEG = np.int32(-0x40000000)
Z = np.int32(0)
ONE = np.int32(1)

BLK = int(os.environ.get("BWAMEM_TPU_PALLAS_ALN_BLK", "128"))


def align_pallas_available() -> bool:
    return _HAVE_PALLAS


def _cummax_sublanes(a, L, blk):
    sh = 1
    while sh < L:
        top = jnp.full((min(sh, L), blk), NEG, jnp.int32)
        a = jnp.maximum(a, jnp.concatenate(
            [top, a[:L - sh, :]], axis=0)[:L, :])
        sh *= 2
    return a


def _make_kernel(LQV, LT, blk, o_del, e_del, o_ins, e_ins, size):
    i32 = jnp.int32
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    def kernel(mat_ref, qt_ref, tt_ref, par_ref, out_ref, rm_ref):
        qlen = par_ref[0:1, :]
        tlen = par_ref[1:2, :]
        endsc = par_ref[2:3, :]
        shift = par_ref[3:4, :]
        sat = np.int32(255) - shift

        jv = lax.broadcasted_iota(i32, (LQV, blk), 0)
        q = qt_ref[:, :]
        qvalid = jv < qlen
        p_lanes = 16 if size == 1 else 8
        vlen = ((qlen + (p_lanes - 1)) // p_lanes) * p_lanes
        vmask = jv < vlen

        prof = []
        for c in range(5):
            pc = jnp.zeros((LQV, blk), i32)
            for qv in range(5):
                pc = pc + jnp.where(q == qv, mat_ref[0, c * 5 + qv],
                                    i32(0))
            prof.append(jnp.where(qvalid, pc, Z))

        rm_ref[:, :] = jnp.zeros((LT, blk), i32)

        st0 = (jnp.int32(0),
               jnp.zeros((LQV, blk), i32),   # H
               jnp.zeros((LQV, blk), i32),   # E
               jnp.zeros((LQV, blk), i32),   # Hmax
               jnp.zeros((1, blk), i32),     # gmax
               jnp.full((1, blk), -1, i32),  # te
               jnp.full((1, blk), -1, i32),  # last
               jnp.zeros((1, blk), i32),     # saturated
               jnp.where(tlen <= 0, ONE, Z))  # done

        def cond(st):
            i, done_c = st[0], st[-1]
            alive = (done_c == 0) & (i < tlen)
            return jnp.max(jnp.where(alive, ONE, Z)) > 0

        def body(st):
            (i, H, E, Hmax, gmax, te, last, sat_c, done_c) = st
            done = done_c != 0
            run = ~done & (i < tlen)
            tch = tt_ref[pl.ds(i, 1), :]
            qp = jnp.zeros((LQV, blk), i32)
            for c in range(5):
                qp = qp + jnp.where(tch == c, prof[c], i32(0))
            hdiag = jnp.concatenate(
                [jnp.zeros((1, blk), i32), H[:LQV - 1, :]], axis=0)
            g = hdiag + qp
            if size == 1:
                g = jnp.clip(g, Z, sat)
            g = jnp.maximum(g, E)
            a_vec = g + jv * e_ins
            cm = _cummax_sublanes(a_vec, LQV, blk)
            cm_prev = jnp.concatenate(
                [jnp.full((1, blk), NEG, i32), cm[:LQV - 1, :]], axis=0)
            F = jnp.maximum(cm_prev - oe_ins - (jv - 1) * e_ins, Z)
            F = jnp.where(jv == 0, Z, F)
            Hn = jnp.where(vmask, jnp.maximum(g, F), Z)
            imax = jnp.max(Hn, axis=0, keepdims=True)
            En = jnp.maximum(E - e_del, jnp.maximum(Hn - oe_del, Z))

            H2 = jnp.where(run, Hn, H)
            E2 = jnp.where(run, En, E)
            rm_ref[pl.ds(i, 1), :] = jnp.where(run, imax, Z)
            improved = run & (imax > gmax)
            gmax2 = jnp.where(improved, imax, gmax)
            te2 = jnp.where(improved, i, te)
            Hmax2 = jnp.where(improved, Hn, Hmax)
            last2 = jnp.where(run, i, last)
            if size == 1:
                sat_brk = improved & (gmax2 + shift >= 255)
            else:
                sat_brk = jnp.zeros((1, blk), bool)
            end_brk = improved & (gmax2 >= endsc)
            done2 = done | (~run & ~done) | sat_brk | end_brk
            return (i + 1, H2, E2, Hmax2, gmax2, te2, last2,
                    sat_c | jnp.where(sat_brk, ONE, Z),
                    jnp.where(done2, ONE, Z))

        st = lax.while_loop(cond, body, st0)
        (_, _, _, Hmax, gmax, te, last, sat_c, _) = st
        mx = jnp.max(Hmax, axis=0, keepdims=True)
        hit = Hmax >= mx
        qe = jnp.min(jnp.where(hit, jv, np.int32(LQV)), axis=0,
                     keepdims=True)
        qe = jnp.where(mx > -1, qe, np.int32(-1))
        out_ref[0:1, :] = gmax
        out_ref[1:2, :] = te
        out_ref[2:3, :] = qe
        out_ref[3:4, :] = sat_c
        out_ref[4:5, :] = last
        out_ref[5:8, :] = jnp.zeros((3, blk), i32)

    return kernel


def align_pallas(query, target, qlen, tlen, mat, o_del, e_del, o_ins,
                 e_ins, endsc, shift, size: int, LQV: int, LT: int):
    """Pallas twin of the ops/ksw_align.py row loop.  Returns
    (gmax, te, qe, saturated(bool), row_max[B, LT], last_row)."""
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
        qlen, tlen, endsc = map(padb, (qlen, tlen, endsc))
    Bp = B + pad

    qt = query.astype(i32).T
    tt = target.astype(i32).T
    params = jnp.stack([qlen, tlen, endsc,
                        jnp.broadcast_to(shift, qlen.shape)]).astype(i32)
    mat_pad = jnp.zeros(32, i32).at[:25].set(mat.astype(i32))[None, :]

    kernel = _make_kernel(LQV, LT, blk, int(o_del), int(e_del),
                          int(o_ins), int(e_ins), int(size))
    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        out, rm = pl.pallas_call(
            kernel,
            grid=(Bp // blk,),
            in_specs=[
                pl.BlockSpec((1, 32), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((LQV, blk), lambda b: (0, b)),
                pl.BlockSpec((LT, blk), lambda b: (0, b)),
                pl.BlockSpec((4, blk), lambda b: (0, b)),
            ],
            out_specs=(pl.BlockSpec((8, blk), lambda b: (0, b)),
                       pl.BlockSpec((LT, blk), lambda b: (0, b))),
            out_shape=(jax.ShapeDtypeStruct((8, Bp), i32),
                       jax.ShapeDtypeStruct((LT, Bp), i32)),
            interpret=interpret,
        )(mat_pad, qt, tt, params)
    out = out[:, :B]
    return (out[0], out[1], out[2], out[3] != 0, rm[:, :B].T, out[4])
