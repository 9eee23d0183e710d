"""On-device construction of extension-wave sequence rows.

The fused left+right extension wave (ops.engine._pack_and_dispatch)
used to upload four 4-bit-packed sequence rows per seed (~700 B/lane,
~11 MB per chunk) — the dominant wave cost over a ~45 MB/s host link.
Every byte of those rows is derivable on device:

  * lq / rq are slices (left one reversed) of the seed's READ, and the
    chunk's reads are already a dense (LQ, n_reads) device matrix,
  * lt / rt are slices of the reference window around the chain
    (core/region.py seed_lr_request, software/bwamem.c:1121-1160), and
    the 2-bit pac lives on device as byte planes.

This module builds the four (L, B) row tensors INSIDE a Mosaic kernel
from ~40 B of scalars per seed:
  * query column = one-hot(read_id) ridden over the MXU against the
    reads matrix; reversal is a constant permutation matmul; per-lane
    slice offsets are log2 static-roll stages (pltpu.roll),
  * target rows gather 4 consecutive 256-base pac rows per side via a
    one-hot matmul, then each output row extracts its base by per-lane
    word select + variable shift; the reverse strand maps to forward
    coordinates with complement (index/bntseq.py get_seq,
    bntseq.c:355-376).

The built rows feed the verified extension DP kernel unchanged
(ops.pallas_extend, pre_t=True) — byte parity with the host-packed
rows is tested in interpret mode.
"""

import os
from functools import partial

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

Z = np.int32(0)
ONE = np.int32(1)

BLK = int(os.environ.get("BWAMEM_TPU_PALLAS_EXT_BLK", "128"))
# caps: reads matrix (LQ, NR) bf16 and pac-row one-hots must fit VMEM
MAX_READS = int(os.environ.get("BWAMEM_TPU_ONCHIP_READS", "16384"))
MAX_PAC_ROWS = int(os.environ.get("BWAMEM_TPU_ONCHIP_PAC_ROWS", "32768"))
_NW = 4  # pac rows gathered per side (covers LT <= 768 + row offset)


def onchip_ext_available(n_reads: int, l_pac: int) -> bool:
    if not _HAVE_PALLAS:
        return False
    # default OFF: over the axon tunnel the extension wave is bound by
    # per-dispatch RTT, not bytes, and the builder costs ~0.6 s of
    # per-process trace + ~50 ms/chunk host prep — a measured NET LOSS
    # on the 4-chunk bench (20.5k -> 12.8k reads/s).  Opt in with
    # BWAMEM_TPU_ONCHIP_EXT=1 where upload bandwidth dominates (long
    # runs, fatter RTT-to-bandwidth ratios).
    flag = os.environ.get("BWAMEM_TPU_ONCHIP_EXT", "0")
    if flag == "0":
        return False
    if jax.default_backend() != "tpu" and flag != "force":
        return False
    from .ksw import _use_pallas_extend
    if not _use_pallas_extend():
        return False
    n_rows = -(-(l_pac + 3) // 4 // 64)
    return (n_reads <= MAX_READS and n_rows <= MAX_PAC_ROWS
            and (l_pac << 1) < (1 << 31))


def onchip_shapes_ok(LQ: int, LT: int) -> bool:
    """Static shape limits of the builder kernel: the varroll needs a
    power-of-two LQ; the _NW-row pac window covers LT + 255 <= _NW*256
    bases."""
    return LQ & (LQ - 1) == 0 and LT + 255 <= _NW * 256


def prep_pac_planes(pac: np.ndarray) -> np.ndarray:
    """Packed pac bytes -> (64, NPRp) float32 byte planes of 16-word
    (256-base) rows; device_put as bf16 by the caller.  Word w of row r
    is little-endian over pac bytes [64r+4w, 64r+4w+4)."""
    by = np.asarray(pac, np.uint8)
    n_rows = -(-len(by) // 64)
    pad = n_rows * 64 - len(by)
    if pad:
        by = np.concatenate([by, np.zeros(pad, np.uint8)])
    by = by.reshape(n_rows, 16, 4)                  # rows, words, bytes
    # layout: row p*16 + t = byte p of word t
    out = np.zeros((64, n_rows), np.float32)
    for p in range(4):
        out[p * 16:(p + 1) * 16] = by[:, :, p].T.astype(np.float32)
    nprp = -(-n_rows // 128) * 128
    if nprp != n_rows:
        out = np.concatenate(
            [out, np.zeros((64, nprp - n_rows), np.float32)], axis=1)
    return out


def _make_builder(LQ, LT, blk, NRp, NPRp):
    i32 = jnp.int32

    def kernel(sc_ref, qmat_ref, pacp_ref, par_ref,
               lq_ref, lt_ref, rq_ref, rt_ref):
        l_pac = sc_ref[0, 0]
        rid = par_ref[0:1, :]
        qb0 = par_ref[1:2, :]
        slen = par_ref[2:3, :]
        rb0 = par_ref[3:4, :]
        rmax0 = par_ref[4:5, :]
        rmax1 = par_ref[5:6, :]
        lquery = par_ref[6:7, :]

        jvQ = lax.broadcasted_iota(i32, (LQ, blk), 0)
        jv64 = lax.broadcasted_iota(i32, (64, blk), 0)

        def varroll(a, n):
            """result[i] = a[(i - n) mod LQ] per lane (LQ power of 2)."""
            sh = 1
            while sh < LQ:
                bit = (lax.shift_right_logical(
                    n, np.int32(int(np.log2(sh)))) & ONE) != Z
                a = jnp.where(bit, pltpu.roll(a, sh, axis=0), a)
                sh *= 2
            return a

        # ---- query column via one-hot matmul over the reads matrix ----
        ior = lax.broadcasted_iota(i32, (NRp, blk), 0)
        ohr = (ior == rid).astype(jnp.bfloat16)
        qcol_f = lax.dot_general(
            qmat_ref[:, :], ohr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qcol = qcol_f.astype(i32)                     # (LQ, blk) 0..4

        # reversal: constant permutation matmul rev[i] = qcol[LQ-1-i]
        ioa = lax.broadcasted_iota(i32, (LQ, LQ), 0)
        iob = lax.broadcasted_iota(i32, (LQ, LQ), 1)
        prev = (ioa + iob == np.int32(LQ - 1)).astype(jnp.bfloat16)
        rev = lax.dot_general(
            prev, qcol_f.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(i32)

        # lq[j] = query[qb0-1-j] for j < qb0 (pad 4)
        lq = jnp.where(jvQ < qb0, varroll(rev, qb0), np.int32(4))
        # rq[j] = query[qe0+j] for j < lquery-qe0 (pad 4)
        qe0 = qb0 + slen
        rq = jnp.where(jvQ < lquery - qe0,
                       varroll(qcol, (np.int32(LQ) - qe0)
                               & np.int32(LQ - 1)), np.int32(4))
        lq_ref[:, :] = lq.astype(jnp.int8)
        rq_ref[:, :] = rq.astype(jnp.int8)

        # ---- target sides from pac ------------------------------------
        rev_st = rmax0 >= l_pac

        def side(p0, d, length, out_ref):
            """out[j] = comp(pac_fwd(p0 + d*j)) for j < length, pad 4."""
            p_lo = jnp.where(d > Z, p0, p0 - np.int32(LT - 1))
            p_lo = jnp.maximum(p_lo, Z)
            r0 = lax.shift_right_logical(p_lo, np.int32(8))
            # gather _NW consecutive 256-base pac rows per lane
            ridx = jnp.concatenate(
                [r0 + np.int32(k) for k in range(_NW)], axis=1)
            from .pallas_smem import _gather_planes
            rows = _gather_planes(pacp_ref, ridx, NPRp, _NW * blk)
            # reassemble 16 words per gathered row, stack to (64, blk)
            wparts = []
            for k in range(_NW):
                rk = rows[:, k * blk:(k + 1) * blk]    # (64, blk) bytes
                wk = (rk[0:16]
                      | lax.shift_left(rk[16:32], np.int32(8))
                      | lax.shift_left(rk[32:48], np.int32(16))
                      | lax.shift_left(rk[48:64], np.int32(24)))
                wparts.append(wk)                      # (16, blk)
            W = jnp.concatenate(wparts, axis=0)        # (64, blk)

            # all LT output rows at once; the word select loops over the
            # 64 gathered words (a 544-row python loop costs seconds of
            # trace + Mosaic lowering per process)
            base0 = p0 - lax.shift_left(r0, np.int32(8))
            jvT = lax.broadcasted_iota(i32, (LT, blk), 0)
            idx = base0 + d * jvT                      # (LT, blk)
            wsel = jnp.clip(lax.shift_right_logical(idx, np.int32(4)),
                            Z, np.int32(63))
            word = jnp.zeros((LT, blk), i32)
            for r in range(64):
                word = word + jnp.where(wsel == np.int32(r),
                                        W[r:r + 1, :], Z)
            shift = ((lax.shift_right_logical(idx, np.int32(2))
                      & np.int32(3)) * np.int32(8)
                     + (((~idx) & np.int32(3)) + ((~idx) & np.int32(3))))
            b = lax.shift_right_logical(word, shift) & np.int32(3)
            b = jnp.where(rev_st, np.int32(3) - b, b)
            out_ref[:, :] = jnp.where(jvT < length, b, np.int32(4)) \
                .astype(jnp.int8)

        two_lp = l_pac + l_pac
        # LEFT: lt[j] = base(rb0-1-j), llt = rb0 - rmax0; empty when the
        # seed starts the read (seed_lr_request's `if s_qbeg` guard)
        lt_p0 = jnp.where(rev_st, two_lp - rb0, rb0 - ONE)
        lt_d = jnp.where(rev_st, ONE, np.int32(-1))
        side(lt_p0, lt_d, jnp.where(qb0 > Z, rb0 - rmax0, Z), lt_ref)
        # RIGHT: rt[j] = base(rb0+slen+j), rlt = rmax1 - rb0 - slen;
        # empty when the seed ends the read
        rt_p0 = jnp.where(rev_st, two_lp - ONE - rb0 - slen, rb0 + slen)
        rt_d = jnp.where(rev_st, np.int32(-1), ONE)
        side(rt_p0, rt_d,
             jnp.where(qb0 + slen != lquery, rmax1 - rb0 - slen, Z),
             rt_ref)

    return kernel


def build_rows_pallas(qmat_bf16, pacp, l_pac, rid, qb0, slen, rb0,
                      rmax0, rmax1, lquery, LQ: int, LT: int,
                      interpret=None):
    """Build the four extension row tensors on device.  Returns
    (lqT, ltT, rqT, rtT) int8 with shapes (LQ, B)/(LT, B) — exactly the
    unpacked rows the host packer would produce (pad base 4)."""
    i32 = jnp.int32
    B = rid.shape[0]
    blk = min(BLK, B)
    assert B % blk == 0, (B, blk)
    NRp = qmat_bf16.shape[1]
    NPRp = pacp.shape[1]

    params = jnp.concatenate([
        rid.astype(i32)[None, :], qb0.astype(i32)[None, :],
        slen.astype(i32)[None, :], rb0.astype(i32)[None, :],
        rmax0.astype(i32)[None, :], rmax1.astype(i32)[None, :],
        lquery.astype(i32)[None, :], jnp.zeros((1, B), i32)], axis=0)
    scal = jnp.concatenate([
        l_pac.astype(i32).reshape(1), jnp.zeros(7, i32)]).reshape(1, 8)

    kernel = _make_builder(LQ, LT, blk, NRp, NPRp)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((LQ, NRp), lambda b: (0, 0)),
                pl.BlockSpec((64, NPRp), lambda b: (0, 0)),
                pl.BlockSpec((8, blk), lambda b: (0, b)),
            ],
            out_specs=[
                pl.BlockSpec((LQ, blk), lambda b: (0, b)),
                pl.BlockSpec((LT, blk), lambda b: (0, b)),
                pl.BlockSpec((LQ, blk), lambda b: (0, b)),
                pl.BlockSpec((LT, blk), lambda b: (0, b)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((LQ, B), jnp.int8),
                jax.ShapeDtypeStruct((LT, B), jnp.int8),
                jax.ShapeDtypeStruct((LQ, B), jnp.int8),
                jax.ShapeDtypeStruct((LT, B), jnp.int8),
            ],
            interpret=interpret,
        )(scal, qmat_bf16, pacp, params)
    return tuple(outs)


@partial(jax.jit, static_argnames=("LQ", "LT", "o_del", "e_del",
                                   "o_ins", "e_ins", "w0", "pc5", "pc3",
                                   "zdrop"))
def extend_lr_onchip(qmat8, pacp, l_pac,
                     rid, qb0, slen, rb0, rmax0, rmax1, lquery,
                     llq, llt, rlq, rlt, sc_seed, s_rbeg64, rmax0_64,
                     mat, o_del: int, e_del: int, o_ins: int, e_ins: int,
                     w0: int, pc5: int, pc3: int, zdrop: int,
                     LQ: int, LT: int):
    """ksw_extend_lr_batched with on-device row construction: uploads
    per-seed scalars only.  Same returns: (score, truesc, qb, rb, qe,
    re, aw0, aw1)."""
    from .ksw import _extend_lr_core
    qmat_bf16 = qmat8.astype(jnp.bfloat16)
    lqT, ltT, rqT, rtT = build_rows_pallas(
        qmat_bf16, pacp, l_pac, rid, qb0, slen, rb0, rmax0, rmax1,
        lquery, LQ, LT)
    return _extend_lr_core(
        lqT, ltT, llq, llt, rqT, rtT, rlq, rlt, mat, o_del, e_del,
        o_ins, e_ins, w0, pc5, pc3, zdrop, sc_seed, qb0, s_rbeg64,
        rmax0_64, lquery, slen, LQ, LT, pre_t=True)
