"""Batched banded Smith-Waterman extension on device.

ksw_extend2 (software/ksw.c:379-477) for a whole wave of (read, chain,
side) extension lanes at once: each DP row is vectorized across the
query dimension AND across lanes, with the horizontal F-dependency
resolved by a prefix max-scan (F(j) unrolls to a running maximum of
G(k)+k*e_ins — same trick the host oracle uses, oracle/ksw.py).

Matches the scalar C semantics exactly: band clamping, the adaptive
band-narrowing scans over the freshly stored H row, z-drop, end-bonus
gscore tracking, and the tie rule that row maxima take the LAST query
index.  Verified lane-for-lane against the host oracle.

All scores are int32 (C uses int32 eh_t); coordinates int32.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

NEG = jnp.int32(-0x40000000)


@partial(jax.jit, static_argnames=("LQ", "LT"))
def ksw_extend2_batched(
        query: jnp.ndarray,    # int32[B, LQ] nt4 (pad 4)
        target: jnp.ndarray,   # int32[B, LT] nt4 (pad 4)
        qlen: jnp.ndarray,     # int32[B]
        tlen: jnp.ndarray,     # int32[B]
        mat: jnp.ndarray,      # int32[25] scoring matrix
        o_del: int, e_del: int, o_ins: int, e_ins: int,
        w_in: jnp.ndarray,     # int32[B] band width per lane
        end_bonus: jnp.ndarray,  # int32[B]
        zdrop: int,
        h0: jnp.ndarray,       # int32[B]
        LQ: int, LT: int):
    """Returns (best, qle, tle, gtle, gscore, max_off), each int32[B]."""
    B = query.shape[0]
    i32 = jnp.int32
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    h0 = jnp.maximum(h0, 0)

    mat55 = mat.reshape(5, 5)
    max_sc = jnp.max(mat).astype(i32)

    # band clamp (ksw.c:398-406); the C float math truncates toward zero
    qlen_f = qlen.astype(jnp.float64)
    max_ins = (((qlen_f * max_sc + end_bonus - o_ins) / e_ins + 1.0)
               .astype(i32))
    max_ins = jnp.maximum(max_ins, 1)
    w = jnp.minimum(w_in, max_ins)
    max_del = (((qlen_f * max_sc + end_bonus - o_del) / e_del + 1.0)
               .astype(i32))
    max_del = jnp.maximum(max_del, 1)
    w = jnp.minimum(w, max_del)

    jv = jnp.arange(LQ + 1, dtype=i32)[None, :]          # [1, LQ+1]
    jq = jnp.arange(LQ, dtype=i32)[None, :]              # [1, LQ]

    # profile: qp[b, j] per row is mat55[target[b,i], query[b,j]]
    # initial eh (ksw.c:390-396): eh_h[j] = max(h0 - oe_ins - (j-1)e_ins, 0)
    eh_h = jnp.where(jv == 0, h0[:, None],
                     jnp.maximum(h0[:, None] - oe_ins
                                 - (jv - 1) * e_ins, 0)).astype(i32)
    eh_h = jnp.where(jv <= qlen[:, None], eh_h, 0)
    eh_e = jnp.zeros((B, LQ + 1), i32)

    state = dict(
        i=jnp.zeros(B, i32),
        eh_h=eh_h, eh_e=eh_e,
        beg=jnp.zeros(B, i32), end=qlen.astype(i32),
        best=h0.astype(i32),
        max_i=jnp.full(B, -1, i32), max_j=jnp.full(B, -1, i32),
        max_ie=jnp.full(B, -1, i32), gscore=jnp.full(B, -1, i32),
        max_off=jnp.zeros(B, i32),
        done=tlen <= 0,
    )

    def body(st):
        i = st["i"]
        alive = ~st["done"] & (i < tlen)
        h1 = jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0)
        beg = jnp.maximum(st["beg"], i - w)
        end = jnp.minimum(jnp.minimum(st["end"], i + w + 1), qlen)
        degen = beg >= end
        run = alive & ~degen

        # row profile
        ii = jnp.clip(i, 0, LT - 1)
        tch = jnp.take_along_axis(target, ii[:, None], 1)[:, 0]     # [B]
        qp = mat55[tch[:, None], query]                             # [B, LQ]
        band = (jq >= beg[:, None]) & (jq < end[:, None])

        hdiag = st["eh_h"][:, :LQ]
        e = st["eh_e"][:, :LQ]
        g = jnp.where(band, hdiag + qp, NEG)
        g = jnp.maximum(g, jnp.where(band, e, NEG))
        # F prefix scan within the band
        a_vec = jnp.where(band, g + jq * e_ins, NEG)
        cm = lax.associative_scan(jnp.maximum, a_vec, axis=1)
        cm_prev = jnp.concatenate(
            [jnp.full((B, 1), NEG, i32), cm[:, :-1]], axis=1)
        f = jnp.maximum(cm_prev - oe_ins - (jq - 1) * e_ins, 0)
        f = jnp.where(jq == beg[:, None], 0, f)
        h = jnp.maximum(g, f)
        h = jnp.where(band, h, 0)

        mrow = jnp.max(jnp.where(band, h, 0), axis=1).astype(i32)
        # mj: LAST band index achieving mrow (ties take later index);
        # when mrow == 0 the C running-max never fires -> mj = end-1
        hit = band & (h >= mrow[:, None]) & (mrow[:, None] > 0)
        mj = jnp.max(jnp.where(hit, jq, -1), axis=1).astype(i32)
        mj = jnp.where(mrow > 0, mj, end - 1)

        # E update + H shift-store (ksw.c:436-447)
        t_ = jnp.maximum(h - oe_del, 0)
        new_e = jnp.maximum(e - e_del, t_)
        eh_e = jnp.where(band & run[:, None], new_e, st["eh_e"][:, :LQ])
        eh_e = jnp.concatenate([eh_e, st["eh_e"][:, LQ:]], axis=1)
        # eh_e[end] = 0
        eh_e = jnp.where(run[:, None] & (jv == end[:, None]), 0, eh_e)

        h_shift = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        store = (jv >= beg[:, None] + 1) & (jv <= end[:, None])
        eh_h_new = jnp.where(store, h_shift, st["eh_h"])
        eh_h_new = jnp.where(jv == beg[:, None], h1[:, None], eh_h_new)
        eh_h_new = jnp.where(run[:, None], eh_h_new, st["eh_h"])

        h1_last = jnp.take_along_axis(
            h, jnp.clip(end - 1, 0, LQ - 1)[:, None], 1)[:, 0]
        at_q_end = run & (end == qlen)
        g_upd = at_q_end & (st["gscore"] <= h1_last)
        max_ie = jnp.where(g_upd, i, st["max_ie"])
        gscore = jnp.where(g_upd, h1_last, st["gscore"])

        zero_brk = run & (mrow == 0)
        improved = run & ~zero_brk & (mrow > st["best"])
        best = jnp.where(improved, mrow, st["best"])
        max_i = jnp.where(improved, i, st["max_i"])
        max_j = jnp.where(improved, mj, st["max_j"])
        off = jnp.abs(mj - i)
        max_off = jnp.where(improved & (st["max_off"] < off), off,
                            st["max_off"])
        # z-drop (ksw.c:455-462) on non-improving rows
        di = i - st["max_i"]
        dj = mj - st["max_j"]
        zd = jnp.where(
            di > dj,
            st["best"] - mrow - (di - dj) * e_del,
            st["best"] - mrow - (dj - di) * e_ins)
        z_brk = (run & ~zero_brk & ~improved & (zdrop > 0)
                 & (zd > zdrop))

        done = st["done"] | (alive & degen) | zero_brk | z_brk \
            | (~alive & ~st["done"])
        cont = run & ~zero_brk & ~z_brk

        # band narrowing over the NEW eh_h (ksw.c:463-466)
        z0 = eh_h_new == 0
        lowz = z0 & (jv >= beg[:, None]) & (jv <= mj[:, None])
        beg_new = jnp.max(jnp.where(lowz, jv, beg[:, None] - 1),
                          axis=1).astype(i32) + 1
        hiz = z0 & (jv >= mj[:, None] + 2) & (jv <= end[:, None])
        first_hi = jnp.min(jnp.where(hiz, jv, LQ + 2), axis=1).astype(i32)
        end_cap = jnp.maximum(mj + 2, end + 1)
        end_new = jnp.minimum(first_hi, end_cap)

        return dict(
            i=jnp.where(cont, i + 1, i),
            eh_h=eh_h_new, eh_e=eh_e,
            beg=jnp.where(cont, beg_new, beg),
            end=jnp.where(cont, end_new, end),
            best=best, max_i=max_i, max_j=max_j,
            max_ie=max_ie, gscore=gscore, max_off=max_off,
            done=done,
        )

    def cond(st):
        return jnp.any(~st["done"] & (st["i"] < tlen))

    st = lax.while_loop(cond, body, state)
    return (st["best"], st["max_j"] + 1, st["max_i"] + 1,
            st["max_ie"] + 1, st["gscore"], st["max_off"])
