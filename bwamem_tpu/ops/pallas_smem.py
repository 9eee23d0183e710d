"""Pallas TPU kernels for the batched SMEM search (bwt_smem1).

The TPU-native equivalent of the reference's 16-PE SMEM engine
(hardware/afu_core.v:4371-5402, software oracle software/bwt.c:299-414)
with the ENTIRE search inside Mosaic kernels.  The XLA twin
(ops.smem._smem1_impl / smem_superstep) pays tens of microseconds of
while-loop scheduling plus relayout copy-starts per extension step, and
a Mosaic<->XLA transition penalty per pass when the two are mixed in
one program; in-kernel, a pass over 2048 lanes measures ~0.2-0.4 ms vs
~35 ms for the XLA pass on v5e — so the full iterator (superstep_pallas)
runs rounds, the re-seed second pass, the ordered merge, and the output
stream append in ONE kernel per lane block.

Data path per extension step (= the FPGA's two occ-line fetches per PE
step, hardware/afu_core.v:1428-1432):
  * the occ-block table lives in VMEM as bf16 BYTE PLANES: row
    p*12 + t holds byte p of word WL[t] of every block, where
    WL = [ck_lo0..ck_lo3, bwt0..bwt7] (the int32-coordinate subset of
    the 16-word block; bytes are exact in bf16, so a one-hot matmul
    reconstructs rows exactly),
  * gather = one-hot(block_idx) ridden over the MXU:
    (48, NBP) @ (NBP, C) -> the occ rows for every lane,
  * popcounts are SWAR int32 (the VPU equivalent of the reference's
    cnt_table LUT, software/bwt.c:60-69).

Layout is TRANSPOSED like ops.pallas_extend: lanes ride the 128-wide
lane axis, per-lane scalars are (1, blk) rows, the interval buffers are
(M, blk) tiles, and every per-lane "dynamic index" is a masked
compare+sum over a small static sublane axis (the RTL's one-hot BRAM
word-enables, hardware/afu_core.v:5946-5969).  The per-lane output
cursor is applied with a variable circular roll (log2 static-roll
stages selected by the cursor's bits).

int32 coordinates only (genomes whose doubled pack fits 31 bits — far
above the VMEM table cap anyway); callers gate with
smem1_pallas_available() and fall back to the XLA twin.
"""

import os
from functools import lru_cache, partial
from types import SimpleNamespace

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

# int32 constants (python ints become weak i64 under x64 and Mosaic
# cannot legalize them)
Z = np.int32(0)
ONE = np.int32(1)
M55 = np.int32(0x55555555)
M33 = np.int32(0x33333333)
M0F = np.int32(0x0F0F0F0F)
ALL1 = np.int32(-1)
BIG = np.int32(1 << 30)

BLK = int(os.environ.get("BWAMEM_TPU_PALLAS_SMEM_BLK", "128"))
# Table-size cap for the Mosaic path.  The one-hot gather costs
# O(n_blocks) per lookup, XLA's native row gather O(lanes) — measured
# crossover is ~35-45k blocks (4 Mbp genome: Mosaic 5.8 s vs XLA-native
# 2.7 s per bench; 105 kbp genome: Mosaic 0.76 s vs XLA-one-hot 1.3 s).
# The default keeps Mosaic where it wins decisively; the slab-chunked
# _gather_planes keeps VMEM bounded up to ~65k blocks via the env.
MAX_BLOCKS = int(os.environ.get("BWAMEM_TPU_PALLAS_SMEM_BLOCKS",
                                "24576"))
# output-stream rows carried in-kernel (power of two for the variable
# roll); OUT_CAP must be <= _OC2
_OC2 = 64

# byte-plane word order: checkpoint lo words (bases 0..3) then the 8
# packed bwt words; the hi checkpoint words are zero for int32 genomes
_WL = [0, 2, 4, 6, 8, 9, 10, 11, 12, 13, 14, 15]

M30 = np.int32((1 << 30) - 1)
B30 = np.int32(1 << 30)


class _CW:
    """Coordinate-plane arithmetic for the Mosaic kernels.

    A coordinate value is a TUPLE of int32 planes of equal shape:
    1 plane for int32 genomes (ops are pass-through, so the traced
    program is exactly the historical one), 2 planes — radix-2^30
    (hi, lo), lo in [0, 2^30) — for int64 genomes, the reference's
    canonical human regime (3 GB BWT whose doubled pack exceeds 2^31,
    software/bwa.c:286-301, hardware/afu_core.v:1428-1432).

    Radix 2^30 instead of 2^32 keeps every plane nonnegative for valid
    coordinates: comparisons stay signed int32 and carries are plain
    compares — the Mosaic VPU has no unsigned compare or carry flag.
    The only negative transient is k-1 at k == 0, which normalizes to
    hi == -1 (caught by ge0 exactly like the scalar sign test).
    """

    def __init__(self, wide: bool):
        self.wide = wide
        self.n = 2 if wide else 1

    # --- constructors ---------------------------------------------------
    def wrap_i32(self, v):
        """Small nonnegative int32 array/scalar -> coordinate."""
        if not self.wide:
            return (v,)
        return (jnp.zeros_like(v), v)

    def const(self, c: int):
        if not self.wide:
            return (np.int32(c),)
        assert 0 <= c < (1 << 30)
        return (Z, np.int32(c))

    def zeros(self, shape):
        return tuple(jnp.zeros(shape, jnp.int32) for _ in range(self.n))

    def full(self, shape, c: int):
        return tuple(jnp.full(shape, np.int32(c), jnp.int32)
                     for _ in range(self.n))

    def from_ck(self, wlo, whi):
        """64-bit checkpoint words (lo32, hi32 int32 bit patterns) ->
        coordinate planes."""
        if not self.wide:
            return (wlo,)
        hi = lax.shift_left(whi, np.int32(2)) \
            + lax.shift_right_logical(wlo, np.int32(30))
        return (hi, wlo & M30)

    # --- structure ------------------------------------------------------
    def map(self, f, *vals):
        return tuple(f(*ps) for ps in zip(*vals))

    def row(self, a, m, w: int = 1):
        return tuple(p[m:m + w] for p in a)

    def colslice(self, a, lo, hi):
        return tuple(p[:, lo:hi] for p in a)

    def cat0(self, vals):
        """Sublane-axis concat of a list of coordinates."""
        return tuple(jnp.concatenate(ps, axis=0) for ps in zip(*vals))

    def cat1(self, vals):
        """Lane-axis concat of a list of coordinates."""
        return tuple(jnp.concatenate(ps, axis=1) for ps in zip(*vals))

    def where(self, cond, a, b):
        return tuple(jnp.where(cond, pa, pb) for pa, pb in zip(a, b))

    # --- arithmetic -----------------------------------------------------
    def addi(self, a, v):
        """a + v for int32 v with 0 <= v < 2^30 (array or scalar)."""
        if not self.wide:
            return (a[0] + v,)
        lo = a[1] + v
        carry = jnp.where(lo >= B30, ONE, Z)
        return (a[0] + carry, lo - jnp.where(carry != Z, B30, Z))

    def subi(self, a, v):
        """a - v for int32 v with 0 <= v < 2^30 (array or scalar)."""
        if not self.wide:
            return (a[0] - v,)
        lo = a[1] - v
        borrow = jnp.where(lo < Z, ONE, Z)
        return (a[0] - borrow, lo + jnp.where(borrow != Z, B30, Z))

    def add(self, a, b):
        if not self.wide:
            return (a[0] + b[0],)
        lo = a[1] + b[1]
        carry = jnp.where(lo >= B30, ONE, Z)
        return (a[0] + b[0] + carry, lo - jnp.where(carry != Z, B30, Z))

    def sub(self, a, b):
        if not self.wide:
            return (a[0] - b[0],)
        lo = a[1] - b[1]
        borrow = jnp.where(lo < Z, ONE, Z)
        return (a[0] - b[0] - borrow,
                lo + jnp.where(borrow != Z, B30, Z))

    # --- comparisons (values normalized; planes broadcast) --------------
    def lt(self, a, b):
        if not self.wide:
            return a[0] < b[0]
        return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))

    def le(self, a, b):
        if not self.wide:
            return a[0] <= b[0]
        return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))

    def ge(self, a, b):
        return ~self.lt(a, b)

    def eq(self, a, b):
        if not self.wide:
            return a[0] == b[0]
        return (a[0] == b[0]) & (a[1] == b[1])

    def ne(self, a, b):
        return ~self.eq(a, b)

    def ge0(self, a):
        return a[0] >= Z

    def lti(self, a, v):
        """a < v for small nonnegative int32 v."""
        if not self.wide:
            return a[0] < v
        return (a[0] < Z) | ((a[0] == Z) & (a[1] < v))

    def lei(self, a, v):
        if not self.wide:
            return a[0] <= v
        return (a[0] < Z) | ((a[0] == Z) & (a[1] <= v))

    def max1(self, a):
        """maximum(a, 1)."""
        if not self.wide:
            return (jnp.maximum(a[0], ONE),)
        return self.where(self.lti(a, ONE), self.const(1), a)

    # --- bit extraction (valid for normalized nonnegative values) -------
    def blkrow(self, a):
        """(a >> 7) as a single int32 plane (occ-block index; int32 up
        to 2^38-char genomes)."""
        if not self.wide:
            return lax.shift_right_logical(a[0], np.int32(7))
        return lax.shift_left(a[0], np.int32(23)) \
            + lax.shift_right_logical(a[1], np.int32(7))

    def shr_i32(self, a, s: int):
        """(a >> s) as int32 for static 0 < s <= 30."""
        if not self.wide:
            return lax.shift_right_logical(a[0], np.int32(s))
        return lax.shift_left(a[0], np.int32(30 - s)) \
            + lax.shift_right_logical(a[1], np.int32(s))

    def andm(self, a, m):
        """a & m for int32 m with 2^30 % (m+1) == 0 (low bits live in
        the lo plane)."""
        return a[-1] & m


def smem1_pallas_available(n_blocks: int, cdt, L: int, M: int,
                           out_cap: int = 48) -> bool:
    if not _HAVE_PALLAS:
        return False
    flag = os.environ.get("BWAMEM_TPU_PALLAS_SMEM", "1")
    if flag == "0":
        return False
    # interpret mode is correct but slow: off-TPU only under "force"
    # (the parity tests call the kernels directly with interpret=True)
    if jax.default_backend() != "tpu" and flag != "force":
        return False
    if cdt != jnp.int32:
        return False
    if n_blocks > MAX_BLOCKS:
        return False
    # L <= 256: the merge key packs (qb, qlen-qe) radix-256 (both
    # operands stay <= 255 even at L=256) and qb/qe ride the uint8
    # wire, where the one overflowing value qe==256 wires as 0 and is
    # decoded by the consumer (a real interval always has qe >= 1).
    # The XLA twin shares the same bound.  (L == 512 is served by the
    # HBM DMA kernels — smem1_pallas_big_available — whose merge key
    # switches to radix-1024 and whose wire widens past uint8.)
    return (L % 32 == 0 and L <= 256 and M <= 32
            and 2 * M <= _OC2 and out_cap <= _OC2)


def prep_table(blocks: jnp.ndarray) -> jnp.ndarray:
    """(n_blocks, 16) uint32 occ table -> (48, NBP) bf16 byte planes
    (NBP padded to a lane-axis multiple of 128).  Runs in XLA once per
    dispatch, outside the extension loops."""
    nb = blocks.shape[0]
    nbp = -(-nb // 128) * 128
    w = blocks[:, _WL].astype(jnp.uint32)            # (nb, 12)
    planes = [((w >> np.uint32(8 * p)) & np.uint32(0xFF)) for p in range(4)]
    t = jnp.concatenate(planes, axis=1)              # (nb, 48)
    t = t.astype(jnp.bfloat16).T                     # (48, nb)
    if nbp != nb:
        t = jnp.concatenate(
            [t, jnp.zeros((48, nbp - nb), jnp.bfloat16)], axis=1)
    return t


def _popc(v):
    """SWAR popcount of int32 bit patterns (sign-safe: logical shifts)."""
    v = v - (lax.shift_right_logical(v, ONE) & M55)
    v = (v & M33) + (lax.shift_right_logical(v, np.int32(2)) & M33)
    v = (v + lax.shift_right_logical(v, np.int32(4))) & M0F
    v = v + lax.shift_right_logical(v, np.int32(8))
    v = v + lax.shift_right_logical(v, np.int32(16))
    return v & np.int32(63)


# VMEM budget for one materialized one-hot slab (elements; bf16 -> 2B
# each).  Tables wider than ELEMS/C are gathered in slab-chunked
# matmuls: only one slab matches any index, so f32 partial sums stay
# exact.
_OH_ELEMS = int(os.environ.get("BWAMEM_TPU_PALLAS_OH_ELEMS",
                               str(2 << 20)))


def _gather_planes(tbl_ref, blkidx, NBP, C):
    """rows[:, c] = tbl[:, blkidx[0, c]] via one-hot MXU matmuls,
    slab-chunked over the table's lane axis to bound VMEM."""
    i32 = jnp.int32
    slab = NBP
    if NBP * C > _OH_ELEMS:
        slab = max(128, (_OH_ELEMS // C) // 128 * 128)
    acc = None
    for lo in range(0, NBP, slab):
        hi = min(lo + slab, NBP)
        iosl = lax.broadcasted_iota(i32, (hi - lo, C), 0)
        oh = (iosl == (blkidx - np.int32(lo))).astype(jnp.bfloat16)
        part = lax.dot_general(
            tbl_ref[:, lo:hi], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc.astype(i32)


def _build_smem1(L, M, blk, NBP, primary, L2, qp, tbl_ref,
                 gather_words=None, MC=None, cw=None,
                 gather_split=None, slot_base=0):
    """Shared tracer for one smem1 pass (fwd + bwd) over a lane block.
    Returns (smem1_sub, bind_qlen, excl_prefix, jvM, ph): smem1_sub(x,
    min_iv, act) -> (ret, n_mem, m0, m1, ms, mqb, mqe, over) with
    act/over as int32 (1, blk) rows.  Exact port of
    ops.smem._smem1_impl (software/bwt.c:776-835).  `qp` is the query
    tile 4-bit packed, (L/2, blk): two bases per byte so the wire pays
    half the upload; sel_q decodes nibbles in place.

    `gather_words` (optional) replaces the one-hot byte-plane gather:
    gather_words(blkidx (1, C)) -> (ck coordinate (4, C), words int32
    (8, C)) — the hook the HBM-resident DMA path (ops.pallas_bigsmem)
    plugs in.  `MC` overrides the backward-pass chunk width (defaults
    to the one-hot VMEM-slab formula).

    `cw` (_CW) sets the coordinate width: every interval coordinate
    (ik0/ik1/s, the m0/m1/ms buffers, min_iv) is a cw-tuple of int32
    planes; primary and L2 entries are cw-tuples of scalars.  The
    narrow (1-plane) default traces the historical int32 program.

    `ph` exposes the pass decomposed into phases (fwd_init/fwd_k2/
    fwd_post/..., see _dual_smem1): the dual-half driver interleaves
    two halves' occ waves through them; smem1_sub is reassembled from
    the same pieces, so there is exactly one copy of the algorithm.
    `slot_base` offsets every wave-slot id (half B of a dual kernel
    runs on slots slot_base..slot_base+1)."""
    i32 = jnp.int32
    if cw is None:
        cw = _CW(False)
    if MC is None:
        MC = max(1, min(M, (4 << 20) // (NBP * 2 * blk * 2)))
        while M % MC:
            MC -= 1

    jvL2 = lax.broadcasted_iota(i32, (L // 2, blk), 0)
    jvM = lax.broadcasted_iota(i32, (M, blk), 0)
    j4 = lax.broadcasted_iota(i32, (4, blk), 0)
    zM = jnp.zeros((M, blk), i32)
    czM = cw.zeros((M, blk))
    cz1 = cw.zeros((1, blk))

    def excl_prefix(v):
        """Exclusive prefix sum along the M sublanes (static loop —
        Mosaic has no cumsum)."""
        rows = []
        acc = jnp.zeros((1, blk), i32)
        for m in range(M):
            rows.append(acc)
            acc = acc + v[m:m + 1]
        return jnp.concatenate(rows, axis=0)

    def sel_q(ii):
        """query[ii[b], b] from the packed tile: select byte ii>>1,
        then the (ii&1)-th nibble."""
        half = jnp.sum(jnp.where(
            jvL2 == lax.shift_right_logical(ii, ONE), qp, Z), axis=0,
            keepdims=True)
        return jnp.where((ii & ONE) != Z,
                         lax.shift_right_logical(half, np.int32(4)),
                         half & np.int32(15))

    def sel_rowM(a, idx):
        return jnp.sum(jnp.where(jvM == idx, a, Z), axis=0, keepdims=True)

    def set_rowM(a, idx, v):
        return jnp.where(jvM == idx, v, a)

    def cset_rowM(a, idx, v):
        return cw.map(lambda p, q2: set_rowM(p, idx, q2), a, v)

    def row0(a, m):
        # row m rebased to sublane offset 0: Mosaic cannot lane-concat
        # slices whose layouts carry their source sublane offsets
        return jnp.sum(jnp.where(jvM == np.int32(m), a, Z), axis=0,
                       keepdims=True)

    def rev_rows(a, n, valid_rows=None):
        """prev[j] = a[n-1-j] (garbage rows allowed unless masked)."""
        src = n - ONE - jvM
        out = jnp.zeros((M, blk), i32)
        for k in range(M):
            out = out + jnp.where(src == np.int32(k), a[k:k + 1, :], Z)
        if valid_rows is not None:
            out = jnp.where(valid_rows, out, Z)
        return out

    def crev_rows(a, n, valid_rows=None):
        return cw.map(lambda p: rev_rows(p, n, valid_rows), a)

    def _occ_prep(k2):
        """Shared head of bwt_occ4: validity, sentinel-adjusted
        coordinate, occ-block index."""
        valid = cw.ge0(k2)
        kk = cw.subi(k2, jnp.where(cw.ge(k2, primary), ONE, Z))
        kk = cw.where(valid, kk, cw.zeros(kk[0].shape))
        return valid, kk, cw.blkrow(kk)

    def _occ_tail(k2, valid, kk, ck, words):
        """Shared tail: masked SWAR popcounts within the fetched block
        + checkpoint add (software/bwt.c:187-204; RTL BWT_OCC4
        hardware/afu_core.v:5653-5897)."""
        C = k2[0].shape[1]
        j8w = lax.broadcasted_iota(i32, (8, C), 0)
        off = cw.andm(kk, np.int32(127))
        wi = lax.shift_right_logical(off, np.int32(4))
        r = (~off) & np.int32(15)
        pmask = ~(lax.shift_left(ONE, r + r) - ONE)
        wmask = jnp.where(j8w < wi, ALL1,
                          jnp.where(j8w == wi, pmask, Z))
        wv = words & wmask
        hb = lax.shift_right_logical(wv, ONE) & M55
        lb = wv & M55
        c3 = jnp.sum(_popc(hb & lb), axis=0, keepdims=True)
        c2 = jnp.sum(_popc(hb & ~lb), axis=0, keepdims=True)
        c1 = jnp.sum(_popc(lb & ~hb), axis=0, keepdims=True)
        c0 = (off + ONE) - c1 - c2 - c3
        within = jnp.concatenate([c0, c1, c2, c3], axis=0)
        return cw.where(valid, cw.addi(ck, within),
                        cw.zeros((4, C)))

    def occ4T(k2, live=None):
        """Batched bwt_occ4 over (1, C) coordinates: the row gather +
        _occ_tail.  k2 is a cw-tuple; returns a cw-tuple of (4, C).

        `live` ((1, C), optional) marks lanes whose fetch matters: the
        DMA path skips whole-dead 8-lane GROUPS (one scalar branch per
        8 DMAs — the round-4 per-DMA skip lost to branch cost, but
        late iterator rounds run almost-empty waves: 3.7x lockstep
        inflation measured on real reads).  Dead lanes inside a live
        group still fetch (cheap); the one-hot path ignores live."""
        C = k2[0].shape[1]
        valid, kk, blkidx = _occ_prep(k2)
        if gather_words is None:
            rows = _gather_planes(tbl_ref, blkidx, NBP, C)
            w = (rows[0:12] | lax.shift_left(rows[12:24], np.int32(8))
                 | lax.shift_left(rows[24:36], np.int32(16))
                 | lax.shift_left(rows[36:48], np.int32(24)))
            ck = (w[0:4],)
            words = w[4:12]
        else:
            ck, words = gather_words(blkidx, live=live)
        return _occ_tail(k2, valid, kk, ck, words)

    if gather_split is not None:
        gs_start, gs_finish = gather_split

        def occ4T_start(k2, slot, guard=None, live=None):
            """Launch the row wave for k2 into `slot` (the backward-
            chunk pipeline overlaps this DMA with the previous chunk's
            popcount math).  `guard` (a scalar bool) skips the wave
            entirely — the dual-half fwd pipeline's dead-half skip
            (per-WAVE, not the per-DMA branch that measured a loss).
            `live` enables the sparse per-8-group skip."""
            _, _, blkidx = _occ_prep(k2)
            gs_start(blkidx, slot_base + slot, guard, live=live)

        def occ4T_finish(k2, slot, guard=None, live=None):
            """Drain slot's wave (skipped under the same guard/flags
            as its start — a wait with no start would hang) and run
            the popcount tail; a dead half's tail math runs on stale
            rows and is masked by its done state downstream."""
            valid, kk, blkidx = _occ_prep(k2)
            ck, words = gs_finish(blkidx, slot_base + slot, guard,
                                  live=live)
            return _occ_tail(k2, valid, kk, ck, words)
    else:
        occ4T_start = occ4T_finish = None

    def extend_k2(x0, x1, s, is_back):
        fwd = x0 if is_back else x1
        fm1 = cw.subi(fwd, ONE)
        return cw.cat1([fm1, cw.add(fm1, s)])

    def extendT(x0, x1, s, is_back, live=None, occ_fn=None):
        """Batched bwt_extend (software/bwt.c:416-429): (1, C)
        cw-tuples -> (4, C) cw-tuple candidates per base.  `occ_fn`
        overrides the occ lookup (the pipelined finish phase).
        `live` ((1, C0) input-lane liveness) doubles to the wave's
        cat layout for the sparse group skip."""
        k2 = extend_k2(x0, x1, s, is_back)
        lv2 = None if live is None else \
            jnp.concatenate([live, live], axis=1)
        both = occ_fn(k2, lv2) if occ_fn is not None \
            else occ4T(k2, live=lv2)
        return extend_post(x0, x1, s, is_back, both)

    def extend_post(x0, x1, s, is_back, both):
        """The occ-independent tail of bwt_extend: candidate interval
        arithmetic from the fetched occ pair."""
        C = x0[0].shape[1]
        fwd = x0 if is_back else x1
        tk = cw.colslice(both, 0, C)
        tl = cw.colslice(both, C, 2 * C)
        l2r = cw.cat0([cw.map(lambda pz, sc: pz + sc,
                              cw.zeros((1, C)), L2[c])
                       for c in range(4)])
        occ_side = cw.add(cw.addi(l2r, ONE), tk)
        oks = cw.sub(tl, tk)
        bump = jnp.where(cw.le(fwd, primary)
                         & cw.ge(cw.subi(cw.add(fwd, s), ONE), primary),
                         ONE, Z)
        prev = cw.addi((x1 if is_back else x0), bump)
        same3 = prev
        same2 = cw.add(same3, cw.row(oks, 3))
        same1 = cw.add(same2, cw.row(oks, 2))
        same0 = cw.add(same1, cw.row(oks, 1))
        same = cw.cat0([same0, same1, same2, same3])
        if is_back:
            return occ_side, same, oks
        return same, occ_side, oks

    def sel_L2(idx):
        out = cw.zeros((1, blk))
        for c in range(5):
            out = cw.map(lambda p, sc: p + jnp.where(
                idx == np.int32(c), sc, Z), out, L2[c])
        return out

    def csel4(a, cc):
        """Select row cc of a (4, blk) cw-tuple -> (1, blk)."""
        return cw.map(lambda p: jnp.sum(jnp.where(j4 == cc, p, Z),
                                        axis=0, keepdims=True), a)

    def any_live(st):
        return jnp.max(jnp.where(st[-1] == Z, ONE, Z)) > Z

    def fwd_init(x, act):
        """bwt_set_intv (software/bwt.h:80) + fwd loop state."""
        qx = sel_q(x)
        bad = jnp.where((qx > np.int32(3)) | (act == Z), ONE, Z)
        qx_c = jnp.where(bad != Z, Z, qx)
        ik0 = cw.addi(sel_L2(qx_c), ONE)
        ik1 = cw.addi(sel_L2(np.int32(3) - qx_c), ONE)
        iks = cw.sub(sel_L2(qx_c + ONE), sel_L2(qx_c))
        ikend = x + ONE
        return (x + ONE, ik0, ik1, iks, ikend, czM, czM, czM, zM,
                jnp.zeros((1, blk), i32), bad)

    def fwd_k2(st):
        (_i, ik0, ik1, iks) = st[:4]
        return extend_k2(ik0, ik1, iks, is_back=False)

    def fwd_post(min_iv, st, both):
        """Forward-extension step (software/bwt.c:790-801) given the
        step's fetched occ pair."""
        qlen = q_len_holder[0]
        (i, ik0, ik1, iks, ikend, c0, c1, cs, cend, n_curr,
         done) = st
        at_end = i >= qlen
        ii = jnp.clip(jnp.minimum(i, qlen - ONE), Z, np.int32(L - 1))
        cb = sel_q(ii)
        is_amb = cb > np.int32(3)
        o0, o1, os_ = extend_post(ik0, ik1, iks, False, both)
        cc = jnp.where(is_amb, Z, np.int32(3) - cb)
        n0 = csel4(o0, cc)
        n1 = csel4(o1, cc)
        ns = csel4(os_, cc)
        changed = cw.ne(ns, iks)
        small = cw.lt(ns, min_iv)
        live = done == Z
        push = live & (at_end | is_amb | changed)
        stop = live & (at_end | is_amb | (changed & small))
        idx = jnp.where(push, n_curr, np.int32(M))
        c0 = cset_rowM(c0, idx, ik0)
        c1 = cset_rowM(c1, idx, ik1)
        cs = cset_rowM(cs, idx, iks)
        cend = set_rowM(cend, idx, ikend)
        n_curr = n_curr + jnp.where(push, ONE, Z)
        cont = live & ~stop
        ik0 = cw.where(cont, n0, ik0)
        ik1 = cw.where(cont, n1, ik1)
        iks = cw.where(cont, ns, iks)
        ikend = jnp.where(cont, i + ONE, ikend)
        done = jnp.where(stop, ONE, done)
        i = i + jnp.where(done == Z, ONE, Z)
        return (i, ik0, ik1, iks, ikend, c0, c1, cs, cend, n_curr,
                done)

    def fwd_fin(x, st):
        """Post-fwd-loop bookkeeping: overflow, next start, reversed
        prev-interval rows (fwd output, bwd input)."""
        (_, _, _, _, _, c0, c1, cs, cend, n_curr, _) = st
        overflow = jnp.where(n_curr > np.int32(M), ONE, Z)
        last = jnp.clip(n_curr - ONE, Z, np.int32(M - 1))
        ret = jnp.where(n_curr > Z, sel_rowM(cend, last), x + ONE)
        p0 = crev_rows(c0, n_curr)
        p1 = crev_rows(c1, n_curr)
        ps = crev_rows(cs, n_curr)
        pend = rev_rows(cend, n_curr)
        return ret, overflow, (p0, p1, ps, pend, n_curr)

    def bwd_init(x, bad, fwdout):
        (p0, p1, ps, pend, n_curr) = fwdout
        bdone = jnp.where((bad != Z) | (n_curr == Z), ONE, Z)
        return (x - ONE, p0, p1, ps, pend, n_curr, czM, czM, czM, zM,
                zM, jnp.zeros((1, blk), i32), bdone)

    # ---- backward extension (software/bwt.c:808-831), decomposed ----
    def bwd_pre(st):
        (i, p0, p1, ps, pend, n_prev, m0, m1, ms, mqb, mqe, n_mem,
         done) = st
        live = done == Z
        ii = jnp.clip(i, Z, np.int32(L - 1))
        cb = sel_q(ii)
        c = jnp.where((i < Z) | (cb > np.int32(3)), np.int32(-1), cb)
        csel = jnp.clip(c, Z, np.int32(3))
        n_max = jnp.max(n_prev)
        ct = jnp.concatenate([csel] * MC, axis=1)
        return (live, c, ct, n_max)

    def fwd_wave_live(st):
        """(1, 2*blk) wave-lane liveness for a fwd step (k/l cat)."""
        lv = jnp.where(st[-1] == Z, ONE, Z)
        return jnp.concatenate([lv, lv], axis=1)

    def bwd_chunk_live(st, pre, mc):
        """(1, 2*MC*blk) wave-lane liveness for bwd chunk mc: row m of
        the chunk is live where the lane still runs and has that many
        prev intervals."""
        n_prev = st[5]
        live = pre[0]
        lv = jnp.concatenate(
            [jnp.where((n_prev > np.int32(m)) & live, ONE, Z)
             for m in range(mc, mc + MC)], axis=1)
        return jnp.concatenate([lv, lv], axis=1)

    def bwd_chunk_inputs(st, mc):
        """MC prev rows rebased + lane-concat for one shared occ4T."""
        p0, p1, ps = st[1], st[2], st[3]
        x0c = cw.map(lambda p: jnp.concatenate(
            [row0(p, m) for m in range(mc, mc + MC)], axis=1), p0)
        x1c = cw.map(lambda p: jnp.concatenate(
            [row0(p, m) for m in range(mc, mc + MC)], axis=1), p1)
        ssc = cw.map(lambda p: jnp.concatenate(
            [row0(p, m) for m in range(mc, mc + MC)], axis=1), ps)
        return x0c, x1c, ssc

    def bwd_k2(st, mc):
        x0c, x1c, ssc = bwd_chunk_inputs(st, mc)
        return extend_k2(x0c, x1c, ssc, is_back=True)

    def bwd_chunk_post(st, pre, mc, both):
        """extend tail + per-chunk base select from the fetched pair."""
        ct = pre[2]
        x0c, x1c, ssc = bwd_chunk_inputs(st, mc)
        o0, o1, os_ = extend_post(x0c, x1c, ssc, True, both)
        j4c = lax.broadcasted_iota(i32, (4, MC * blk), 0)

        def selc(a):
            return cw.map(lambda p: jnp.sum(
                jnp.where(j4c == ct, p, Z), axis=0,
                keepdims=True), a)
        return selc(o0) + selc(o1) + selc(os_)

    def bwd_dead_chunk():
        zr = jnp.zeros((1, MC * blk), i32)
        return (zr,) * (3 * cw.n)

    def bwd_chunk_step(st, pre, mci, mc, piped):
        """cond-guarded fetch+tail for chunk mc.  piped=True runs the
        chunk-wave pipeline: chunk mc+1's row wave launches into the
        other buffer slot BEFORE chunk mc's drain+popcounts, so its
        HBM fetches fly under mc's VPU math — the per-wave cost, not
        iterator work, is what grows with table size (BASELINE.md
        round 4)."""
        n_max = pre[3]
        slot = mci & 1

        def live_chunk():
            if piped and mc + MC < M:
                @pl.when(np.int32(mc + MC) < n_max)
                def _():
                    occ4T_start(bwd_k2(st, mc + MC), slot ^ 1,
                                live=bwd_chunk_live(st, pre, mc + MC))
            k2 = bwd_k2(st, mc)
            lv = bwd_chunk_live(st, pre, mc)
            both = occ4T_finish(k2, slot, live=lv) if piped \
                else occ4T(k2, live=lv)
            return bwd_chunk_post(st, pre, mc, both)

        return lax.cond(np.int32(mc) < n_max, live_chunk,
                        bwd_dead_chunk)

    def bwd_collect(rrs):
        """Stitch per-chunk (1, MC*blk) rows back into (M, blk)."""
        rows0 = [[] for _ in range(cw.n)]
        rows1 = [[] for _ in range(cw.n)]
        rowss = [[] for _ in range(cw.n)]
        for rr in rrs:
            r0, r1, rs = (rr[:cw.n], rr[cw.n:2 * cw.n],
                          rr[2 * cw.n:])
            for m in range(MC):
                for p in range(cw.n):
                    rows0[p].append(r0[p][:, m * blk:(m + 1) * blk])
                    rows1[p].append(r1[p][:, m * blk:(m + 1) * blk])
                    rowss[p].append(rs[p][:, m * blk:(m + 1) * blk])
        n0 = tuple(jnp.concatenate(rw, axis=0) for rw in rows0)
        n1 = tuple(jnp.concatenate(rw, axis=0) for rw in rows1)
        ns = tuple(jnp.concatenate(rw, axis=0) for rw in rowss)
        return n0, n1, ns

    def bwd_merge(min_iv, st, pre, gathered):
        """Dedup + compaction + mem append from the gathered rows."""
        (i, p0, p1, ps, pend, n_prev, m0, m1, ms, mqb, mqe, n_mem,
         done) = st
        (live, c, _ct, _n_max) = pre
        n0, n1, ns = gathered

        present = (jvM < n_prev) & live
        fail = (c < Z) | cw.lt(ns, min_iv)
        nonfail = present & ~fail

        # dedup: prev nonfail size strictly before each row
        prev_s = cw.zeros((M, blk))
        run = tuple(jnp.full((1, blk), np.int32(-1), i32)
                    for _ in range(cw.n))
        for m in range(M):
            prev_s = cw.map(
                lambda p, rp: jnp.where(jvM == np.int32(m), rp, p),
                prev_s, run)
            run = cw.map(
                lambda rp, nsp: jnp.where(nonfail[m:m + 1],
                                          nsp[m:m + 1], rp),
                run, ns)
        nf = jnp.where(nonfail, ONE, Z)
        nf_before = excl_prefix(nf)
        first_nf = nonfail & (nf_before == Z)
        keep = nonfail & (first_nf | cw.ne(ns, prev_s))
        kp = jnp.where(keep, ONE, Z)
        pos = excl_prefix(kp)
        tgt = jnp.where(keep, pos, np.int32(M))
        nc0 = cw.zeros((M, blk))
        nc1 = cw.zeros((M, blk))
        ncs = cw.zeros((M, blk))
        ncend = jnp.zeros((M, blk), i32)
        for m in range(M):
            hit = tgt[m:m + 1] == jvM             # (M, blk)
            nc0 = cw.map(lambda a, s_: a + jnp.where(
                hit, s_[m:m + 1], Z), nc0, n0)
            nc1 = cw.map(lambda a, s_: a + jnp.where(
                hit, s_[m:m + 1], Z), nc1, n1)
            ncs = cw.map(lambda a, s_: a + jnp.where(
                hit, s_[m:m + 1], Z), ncs, ns)
            ncend = ncend + jnp.where(hit, pend[m:m + 1], Z)
        n_curr_new = jnp.sum(kp, axis=0, keepdims=True)

        # mem append: first present&fail row with an all-fail prefix
        cand = present & fail & (nf_before == Z)
        cd = jnp.where(cand, ONE, Z)
        cd_before = excl_prefix(cd)
        first_cand = cand & (cd_before == Z)      # <=1 per lane
        has_cand = jnp.max(jnp.where(first_cand, ONE, Z), axis=0,
                           keepdims=True)
        lastm = jnp.maximum(n_mem - ONE, Z)
        allow = (n_mem == Z) | ((i + ONE) < sel_rowM(mqb, lastm))
        do_mem = live & (has_cand != Z) & allow

        def sel_fc(a):
            return jnp.sum(jnp.where(first_cand, a, Z), axis=0,
                           keepdims=True)

        def csel_fc(a):
            return cw.map(sel_fc, a)

        midx = jnp.where(do_mem, n_mem, np.int32(M))
        m0 = cset_rowM(m0, midx, csel_fc(p0))
        m1 = cset_rowM(m1, midx, csel_fc(p1))
        ms = cset_rowM(ms, midx, csel_fc(ps))
        mqb = set_rowM(mqb, midx, i + ONE)
        mqe = set_rowM(mqe, midx, sel_fc(pend))
        n_mem = n_mem + jnp.where(do_mem, ONE, Z)
        done = jnp.where(n_curr_new == Z, ONE, done)
        i = i - jnp.where(done == Z, ONE, Z)
        return (i, nc0, nc1, ncs, ncend, n_curr_new, m0, m1, ms,
                mqb, mqe, n_mem, done)

    def bwd_fin(st):
        """reverse mem to qb-ascending (software/bwt.c:833), zeros
        outside the first n_mem rows (ops.select.permute_cols)."""
        (_, _, _, _, _, _, m0, m1, ms, mqb, mqe, n_mem, _) = st
        validm = jvM < n_mem
        m0 = crev_rows(m0, n_mem, validm)
        m1 = crev_rows(m1, n_mem, validm)
        ms = crev_rows(ms, n_mem, validm)
        mqb = rev_rows(mqb, n_mem, validm)
        mqe = rev_rows(mqe, n_mem, validm)
        return n_mem, m0, m1, ms, mqb, mqe

    use_pipe = gather_split is not None and M > MC

    def smem1_sub(x, min_iv_in, act):
        min_iv = cw.max1(min_iv_in)
        st = fwd_init(x, act)
        bad = st[-1]

        def fwd_body(st):
            return fwd_post(min_iv, st, occ4T(
                fwd_k2(st), live=fwd_wave_live(st)))

        st = lax.while_loop(any_live, fwd_body, st)
        ret, overflow, fwdout = fwd_fin(x, st)

        def bwd_body(st):
            pre = bwd_pre(st)
            if use_pipe:
                @pl.when(Z < pre[3])
                def _():
                    occ4T_start(bwd_k2(st, 0), 0,
                                live=bwd_chunk_live(st, pre, 0))
            rrs = [bwd_chunk_step(st, pre, mci, mc, use_pipe)
                   for mci, mc in enumerate(range(0, M, MC))]
            return bwd_merge(min_iv, st, pre, bwd_collect(rrs))

        st = lax.while_loop(any_live, bwd_body, bwd_init(x, bad,
                                                         fwdout))
        n_mem, m0, m1, ms, mqb, mqe = bwd_fin(st)
        return ret, n_mem, m0, m1, ms, mqb, mqe, overflow

    # qlen is bound by the caller (a mutable one-slot holder keeps
    # smem1_sub's signature identical to the XLA _smem1_impl's)
    q_len_holder = [None]

    def bind_qlen(qlen):
        q_len_holder[0] = qlen

    ph = SimpleNamespace(
        M=M, MC=MC, blk=blk, cw=cw, use_split=gather_split is not None,
        max1=cw.max1, any_live=any_live,
        fwd_init=fwd_init, fwd_k2=fwd_k2, fwd_post=fwd_post,
        fwd_fin=fwd_fin, bwd_init=bwd_init, bwd_pre=bwd_pre,
        bwd_k2=bwd_k2, bwd_chunk_post=bwd_chunk_post,
        bwd_dead_chunk=bwd_dead_chunk, bwd_chunk_step=bwd_chunk_step,
        bwd_collect=bwd_collect, bwd_merge=bwd_merge, bwd_fin=bwd_fin,
        fwd_wave_live=fwd_wave_live, bwd_chunk_live=bwd_chunk_live,
        occ_start=occ4T_start, occ_finish=occ4T_finish)
    return smem1_sub, bind_qlen, excl_prefix, jvM, ph



def _multi_smem1(phs):
    """Fused smem1 over H independent lane halves in ONE kernel
    instance: each half runs the classic 128-lane iterator, but the
    halves' occ-row DMA waves ride separate scratch-slot pairs and fly
    CONCURRENTLY — half h's HBM latency hides under the other halves'
    waves and popcount math.  Measured (tools/microbench_bigsmem.py
    gwk, 256 Mbp table): 2 chains overlap at 1.88x efficiency, 3 at
    2.87x — the wave is latency-bound, not bandwidth-bound, so
    independent waves are nearly free.  This is the fwd-pass analog of
    the round-4 backward-chunk pipeline (which only overlapped chunks
    WITHIN one lane block).

    The halves lockstep at loop granularity (a fused while_loop runs
    until every half's is done); a finished half's waves are skipped
    per-WAVE via the guard (the per-DMA skip measured a loss), and its
    lane math is masked by its done row exactly like dead lanes.

    phs: one _build_smem1 ph namespace per half, slot_base=2h.
    Returns run(args) with args = [(x, min_iv_in, act)] * H ->
    [smem1_sub result tuple] * H, each byte-identical to the classic
    single-half smem1_sub on that half's lanes."""
    H = len(phs)
    M, MC = phs[0].M, phs[0].MC

    def live_of(st):
        return jnp.max(jnp.where(st[-1] == Z, ONE, Z)) > Z

    def any_h(sts):
        a = jnp.max(jnp.where(sts[0][-1] == Z, ONE, Z))
        for st in sts[1:]:
            a = jnp.maximum(a, jnp.max(jnp.where(st[-1] == Z, ONE, Z)))
        return a > Z

    def run(args):
        min_ivs = [ph.max1(a[1]) for ph, a in zip(phs, args)]
        sts = [ph.fwd_init(a[0], a[2]) for ph, a in zip(phs, args)]
        bads = [st[-1] for st in sts]

        def fwd_body(sts):
            k2s = [ph.fwd_k2(st) for ph, st in zip(phs, sts)]
            guard = os.environ.get("BWAMEM_TPU_BIG_FWD_GUARD",
                                   "1") != "0"
            gs = [live_of(st) if guard else None for st in sts]
            lvs = [ph.fwd_wave_live(st) for ph, st in zip(phs, sts)]
            for h in range(H):
                phs[h].occ_start(k2s[h], 0, gs[h], live=lvs[h])
            out = []
            for h in range(H):
                both = phs[h].occ_finish(k2s[h], 0, gs[h],
                                         live=lvs[h])
                out.append(phs[h].fwd_post(min_ivs[h], sts[h], both))
            return tuple(out)

        sts = lax.while_loop(any_h, fwd_body, tuple(sts))
        fins = [ph.fwd_fin(a[0], st)
                for ph, a, st in zip(phs, args, sts)]
        sts = [ph.bwd_init(a[0], bad, f[2])
               for ph, a, bad, f in zip(phs, args, bads, fins)]

        def bwd_body(sts):
            pres = [ph.bwd_pre(st) for ph, st in zip(phs, sts)]
            for h in range(H):
                ph, st, pre = phs[h], sts[h], pres[h]

                @pl.when(Z < pre[3])
                def _(ph=ph, st=st, pre=pre):
                    ph.occ_start(ph.bwd_k2(st, 0), 0,
                                 live=ph.bwd_chunk_live(st, pre, 0))
            rrs = [[] for _ in range(H)]
            for mci, mc in enumerate(range(0, M, MC)):
                for h in range(H):
                    rrs[h].append(phs[h].bwd_chunk_step(
                        sts[h], pres[h], mci, mc, True))
            return tuple(
                ph.bwd_merge(mi, st, pre, ph.bwd_collect(rr))
                for ph, mi, st, pre, rr in zip(phs, min_ivs, sts,
                                               pres, rrs))

        sts = lax.while_loop(any_h, bwd_body, tuple(sts))
        outs = []
        for h in range(H):
            n_mem, m0, m1, ms, mqb, mqe = phs[h].bwd_fin(sts[h])
            outs.append((fins[h][0], n_mem, m0, m1, ms, mqb, mqe,
                         fins[h][1]))
        return outs

    return run


def _read_scal(sc_ref, wide: bool):
    """Decode the scalar row: (primary, L2[0..4], seq_len) as cw-tuples
    of scalars.  Narrow layout (1, 8): [primary, L2*5, seq_len, 0];
    wide (1, 16): hi/lo scalar pairs in the same order."""
    if not wide:
        return ((sc_ref[0, 0],),
                [(sc_ref[0, 1 + c],) for c in range(5)],
                (sc_ref[0, 6],))
    return ((sc_ref[0, 0], sc_ref[0, 1]),
            [(sc_ref[0, 2 + 2 * c], sc_ref[0, 3 + 2 * c])
             for c in range(5)],
            (sc_ref[0, 12], sc_ref[0, 13]))


def _kernel_rows(M, wide: bool, base: int):
    """Output row count for `base` int32 rows + 3 coordinate buffers of
    M rows + 2 int32 buffers of M rows, 8-padded."""
    n = base + (3 * (2 if wide else 1) + 2) * M
    return n + ((-n) % 8)


def _make_kernel(L, M, blk, NBP, gather_factory=None, wide=False):
    """Single-pass kernel (the _smem1_impl twin; parity surface).
    `gather_factory(tbl_ref, scratch) -> (gather_words, MC)` swaps in
    the HBM DMA gather (ops.pallas_bigsmem); scratch refs follow the
    output ref in the kernel signature.  wide=True runs the radix-2^30
    paired-plane coordinate path for int64 genomes."""
    i32 = jnp.int32
    cw = _CW(wide)

    def kernel(sc_ref, tbl_ref, q_ref, par_ref, out_ref, *scratch):
        primary, L2, _ = _read_scal(sc_ref, wide)
        qlen = par_ref[0:1, :]
        x = par_ref[1:2, :]
        if wide:
            min_iv = (par_ref[2:3, :], par_ref[3:4, :])
            active = par_ref[4:5, :]
        else:
            min_iv = (par_ref[2:3, :],)
            active = par_ref[3:4, :]
        qp = q_ref[:, :].astype(i32)

        gf = (gather_factory(tbl_ref, scratch)
              if gather_factory is not None else (None, None, None))
        gw, MC = gf[0], gf[1]
        gsplit = gf[2] if len(gf) > 2 else None
        smem1_sub, bind_qlen, _, _, _ = _build_smem1(
            L, M, blk, NBP, primary, L2, qp, tbl_ref,
            gather_words=gw, MC=MC, cw=cw, gather_split=gsplit)
        bind_qlen(qlen)
        (ret, n_mem, m0, m1, ms, mqb, mqe, overflow) = smem1_sub(
            x, min_iv, active)

        out_ref[0:1, :] = ret
        out_ref[1:2, :] = n_mem
        out_ref[2:3, :] = overflow
        r = 3
        for buf in (m0, m1, ms):
            for p in buf:
                out_ref[r:r + M, :] = p
                r += M
        out_ref[r:r + M, :] = mqb
        out_ref[r + M:r + 2 * M, :] = mqe
        r += 2 * M
        pad = (-r) % 8
        if pad:
            out_ref[r:r + pad, :] = jnp.zeros((pad, blk), i32)

    return kernel


def _make_superstep_kernel(L, M, blk, NBP, OUT_CAP, gather_factory=None,
                           wide=False, halves=1):
    """The WHOLE per-read SMEM iterator in one kernel: rounds of
    pass1 + re-seed test + pass2 + ordered merge + stream append
    (ops.smem.smem_superstep's round_body, software/bwamem.c:110-241),
    with zero Mosaic<->XLA transitions inside the loop.
    `gather_factory`/`wide` as in _make_kernel.

    halves=H > 1 processes H independent blk-lane halves per kernel
    instance (in/out blocks are H*blk lanes wide) with their DMA waves
    interleaved through _multi_smem1 — the fwd-pass latency hiding the
    round-4 wave economics called for.  Requires a gather_factory with
    split (start/finish) support and 2H scratch slots."""
    i32 = jnp.int32
    cw = _CW(wide)
    assert 2 * M <= _OC2 and OUT_CAP <= _OC2

    def _round_phases(qlen, min_intv, active, split_len, split_width,
                      excl_prefix, jvM):
        """Per-half round machinery: pass-1 args -> re-seed test ->
        pass-2 args -> ordered merge + stream append, decomposed so the
        halves' smem1 passes can be fused (the phases themselves are
        pure per-half math)."""
        jvO = lax.broadcasted_iota(i32, (_OC2, blk), 0)
        zO = jnp.zeros((_OC2, blk), i32)
        czO = cw.zeros((_OC2, blk))

        def varroll(a, n):
            """Circular roll of the _OC2 sublanes down by per-lane n
            (log2 stages of static pltpu.roll + per-lane select)."""
            sh = 1
            while sh < _OC2:
                bit = (lax.shift_right_logical(n, np.int32(
                    int(np.log2(sh)))) & ONE) != Z
                a = jnp.where(bit, pltpu.roll(a, sh, axis=0), a)
                sh *= 2
            return a

        def place(vals, rank, nrows):
            """(nrows, blk) scatter: out[rank[m]] = vals[m] (rank >=
            _OC2 drops); static loop over source rows."""
            out = zO
            for m in range(nrows):
                out = out + jnp.where(jvO == rank[m:m + 1],
                                      vals[m:m + 1], Z)
            return out

        def r_args(st):
            done = st[-1]
            act = jnp.where(done == Z, ONE, Z)
            return (st[0], min_intv, act)

        def r_mid(st, res1):
            """re-seeding test (software/bwamem.c:185-204): pass-2
            args + carried pass-1 results."""
            done = st[-1]
            act = jnp.where(done == Z, ONE, Z)
            (ret, n_mem, m0, m1, ms, mqb, mqe, ov1) = res1
            ov1 = jnp.where((ov1 != Z) | (n_mem > np.int32(M)), ONE, Z)
            lens = mqe - mqb
            validm = jvM < n_mem
            lens = jnp.where(validm, lens, np.int32(-1))
            best_len = jnp.max(lens, axis=0, keepdims=True)
            hitv = jnp.where(lens == best_len, ONE, Z)
            hb = excl_prefix(hitv)
            first_hit = (hitv != Z) & (hb == Z)

            def sel_fh(a):
                return jnp.sum(jnp.where(first_hit, a, Z), axis=0,
                               keepdims=True)

            bs = cw.map(sel_fh, ms)
            bqb = sel_fh(mqb)
            bqe = sel_fh(mqe)
            need2 = ((act != Z) & (n_mem > Z) & (split_len > Z)
                     & (best_len >= split_len)
                     & cw.le(bs, cw.wrap_i32(split_width))
                     & (ov1 == Z))
            x2 = lax.shift_right_logical(bqb + bqe, ONE)
            n2act = jnp.where(need2, ONE, Z)
            mi2 = cw.where(need2, cw.addi(bs, ONE), cw.const(1))
            args2 = (jnp.where(need2, x2, Z), mi2, n2act)
            mid = (act, ret, n_mem, m0, m1, ms, mqb, mqe, ov1,
                   best_len, need2)
            return args2, mid

        def r_end(st, mid, res2):
            (x, n_out, o0, o1, os_, oqb, oqe, over, done) = st
            (act, ret, n_mem, m0, m1, ms, mqb, mqe, ov1, best_len,
             need2) = mid
            (_r2, n2, s0, s1, ss, sqb, sqe, ov2p) = res2
            n2 = jnp.where(need2, n2, Z)
            ov2 = jnp.where(need2 & ((ov2p != Z) | (n2 > np.int32(M))),
                            ONE, Z)

            # ordered merge (software/bwamem.c:206-238): key qb-major,
            # (qlen-qe)-minor in one int32 (radix 256 for the classic
            # <=256 bp buckets — trace-identical to rounds 1-3 — and
            # 1024 for the 512 bp bucket, still < 2^19)
            KR = np.int32(256 if L <= 256 else 1024)
            key_m = mqb * KR + (qlen - mqe)
            key_s = sqb * KR + (qlen - sqe)
            valid_m = jvM < n_mem
            keep_s = ((jvM < n2)
                      & ((sqe - sqb) >= lax.shift_right_logical(
                          best_len, ONE))
                      & (sqe > x))
            kp = jnp.where(keep_s, ONE, Z)
            pos = excl_prefix(kp)
            tgt = jnp.where(keep_s, pos, np.int32(M))
            cs0 = cw.map(lambda p: place(p, tgt, M)[:M], s0)
            cs1 = cw.map(lambda p: place(p, tgt, M)[:M], s1)
            css = cw.map(lambda p: place(p, tgt, M)[:M], ss)
            csqb = place(sqb, tgt, M)[:M]
            csqe = place(sqe, tgt, M)[:M]
            ckey_s = place(key_s, tgt, M)[:M]
            ns_cnt = jnp.sum(kp, axis=0, keepdims=True)
            valid_s = jvM < ns_cnt

            km = jnp.where(valid_m, key_m, BIG)
            ks = jnp.where(valid_s, ckey_s, BIG)
            # stable merge, sub first on ties: rank_m[i] = i + #{j:
            # ks[j] <= km[i]}, rank_s[j] = j + #{i: km[i] < ks[j]}
            rank_m_rows = []
            rank_s_rows = []
            for m in range(M):
                kmi = km[m:m + 1]
                cnt = jnp.sum(jnp.where(ks <= kmi, ONE, Z), axis=0,
                              keepdims=True)
                rank_m_rows.append(np.int32(m) + cnt)
                ksj = ks[m:m + 1]
                cnt2 = jnp.sum(jnp.where(km < ksj, ONE, Z), axis=0,
                               keepdims=True)
                rank_s_rows.append(np.int32(m) + cnt2)
            rank_m = jnp.concatenate(rank_m_rows, axis=0)
            rank_s = jnp.concatenate(rank_s_rows, axis=0)
            rank_m = jnp.where(valid_m, rank_m, np.int32(2 * M))
            rank_s = jnp.where(valid_s, rank_s, np.int32(2 * M))

            # merged[k] gathered from (main | sub) by rank, then rolled
            # to the per-lane output cursor
            n_mrg = n_mem + ns_cnt
            in_app = (jvO >= n_out) & (jvO < n_out + n_mrg) \
                & (jvO < np.int32(OUT_CAP))

            def append(buf, mv, sv):
                g = place(mv, rank_m, M) + place(sv, rank_s, M)
                return jnp.where(in_app, varroll(g, n_out), buf)

            def cappend(buf, mv, sv):
                return cw.map(append, buf, mv, sv)

            o0 = cappend(o0, m0, cs0)
            o1 = cappend(o1, m1, cs1)
            os_ = cappend(os_, ms, css)
            oqb = append(oqb, mqb, csqb)
            oqe = append(oqe, mqe, csqe)

            n_new = n_out + jnp.where(act != Z, n_mrg, Z)
            over_now = ((act != Z)
                        & ((ov1 != Z) | (ov2 != Z)
                           | (n_new > np.int32(OUT_CAP))))
            over = jnp.where(over_now, ONE, over)
            n_out = jnp.where((act != Z) & ~over_now, n_new, n_out)
            x = jnp.where(act != Z, ret, x)
            done = jnp.where(over_now | (x >= qlen), ONE, done)
            return (x, n_out, o0, o1, os_, oqb, oqe, over, done)

        def st0():
            x0 = jnp.zeros((1, blk), i32)
            done0 = jnp.where((active == Z) | (x0 >= qlen), ONE, Z)
            return (x0, jnp.zeros((1, blk), i32), czO, czO, czO, zO,
                    zO, jnp.zeros((1, blk), i32), done0)

        return SimpleNamespace(r_args=r_args, r_mid=r_mid, r_end=r_end,
                               st0=st0)

    def _write_out(out_ref, st, lo):
        (_, n_out, o0, o1, os_, oqb, oqe, over, _) = st
        OC = OUT_CAP
        hi = lo + blk
        out_ref[0:1, lo:hi] = n_out
        out_ref[1:2, lo:hi] = over
        r = 2
        for buf in (o0, o1, os_):
            for p in buf:
                out_ref[r:r + OC, lo:hi] = p[:OC]
                r += OC
        out_ref[r:r + OC, lo:hi] = oqb[:OC]
        out_ref[r + OC:r + 2 * OC, lo:hi] = oqe[:OC]
        r += 2 * OC
        pad = (-r) % 8
        if pad:
            out_ref[r:r + pad, lo:hi] = jnp.zeros((pad, blk), i32)

    def kernel(sc_ref, tbl_ref, q_ref, par_ref, out_ref, *scratch):
        primary, L2, _ = _read_scal(sc_ref, wide)
        gf = (gather_factory(tbl_ref, scratch)
              if gather_factory is not None else (None, None, None))
        gw, MC = gf[0], gf[1]
        gsplit = gf[2] if len(gf) > 2 else None
        assert halves == 1 or gsplit is not None, \
            "multi-half kernels need a split-capable gather"

        subs, phs, rps = [], [], []
        for h in range(halves):
            lo = h * blk
            hi = lo + blk
            qlen = par_ref[0:1, lo:hi]
            if wide:
                min_intv = (par_ref[1:2, lo:hi], par_ref[2:3, lo:hi])
                active = par_ref[3:4, lo:hi]
                split_len = par_ref[4:5, lo:hi]
                split_width = par_ref[5:6, lo:hi]
            else:
                min_intv = (par_ref[1:2, lo:hi],)
                active = par_ref[2:3, lo:hi]
                split_len = par_ref[3:4, lo:hi]
                split_width = par_ref[4:5, lo:hi]
            qp = q_ref[:, lo:hi].astype(i32)
            sub, bind_qlen, excl_prefix, jvM, ph = _build_smem1(
                L, M, blk, NBP, primary, L2, qp, tbl_ref,
                gather_words=gw, MC=MC, cw=cw, gather_split=gsplit,
                slot_base=2 * h)
            bind_qlen(qlen)
            subs.append(sub)
            phs.append(ph)
            rps.append(_round_phases(qlen, min_intv, active, split_len,
                                     split_width, excl_prefix, jvM))

        if halves == 1:
            sub, rp = subs[0], rps[0]

            def round_body(st):
                res1 = sub(*rp.r_args(st))
                args2, mid = rp.r_mid(st, res1)
                res2 = sub(*args2)
                return rp.r_end(st, mid, res2)

            def any_live(st):
                return jnp.max(jnp.where(st[-1] == Z, ONE, Z)) > Z

            st = lax.while_loop(any_live, round_body, rp.st0())
            _write_out(out_ref, st, 0)
            return

        multi = _multi_smem1(phs)

        def round_body_h(sts):
            res1 = multi([rp.r_args(st) for rp, st in zip(rps, sts)])
            mids = [rp.r_mid(st, r1)
                    for rp, st, r1 in zip(rps, sts, res1)]
            res2 = multi([m[0] for m in mids])
            return tuple(rp.r_end(st, m[1], r2)
                         for rp, st, m, r2 in zip(rps, sts, mids,
                                                  res2))

        def any_h(sts):
            a = jnp.max(jnp.where(sts[0][-1] == Z, ONE, Z))
            for st in sts[1:]:
                a = jnp.maximum(
                    a, jnp.max(jnp.where(st[-1] == Z, ONE, Z)))
            return a > Z

        sts = lax.while_loop(any_h, round_body_h,
                             tuple(rp.st0() for rp in rps))
        for h in range(halves):
            _write_out(out_ref, sts[h], h * blk)

    return kernel


def _scal_row(primary, L2):
    i32 = jnp.int32
    return jnp.concatenate([
        primary.astype(i32).reshape(1),
        L2.astype(i32).reshape(5),
        jnp.zeros(2, i32)]).reshape(1, 8)


def _pack_q(q, L, packed):
    """(B, L) bases -> (B, L/2) two-per-byte (device-side when the
    caller didn't pre-pack on the host)."""
    if packed:
        return q.astype(jnp.int8)
    q = q.astype(jnp.int8)
    return q[:, 0::2] | (q[:, 1::2] << np.int8(4))


def smem1_pallas(tbl, primary, L2, q, qlen, x, min_intv, active,
                 L: int, M: int, interpret=None, packed=False):
    """Drop-in twin of ops.smem._smem1_impl (M_OUT=0 form) backed by the
    Mosaic kernel.  `tbl` is prep_table(blocks); all coordinates int32.

    Returns (ret, n_mem, m0, m1, ms, mqb, mqe, overflow) with the exact
    values (including zero padding) of the XLA implementation."""
    i32 = jnp.int32
    B = q.shape[0]
    blk = min(BLK, B)
    assert B % blk == 0, (B, blk)
    NBP = tbl.shape[1]

    qT = _pack_q(q, L, packed).T                    # (L/2, B)
    params = jnp.concatenate([
        qlen.astype(i32)[None, :],
        x.astype(i32)[None, :],
        min_intv.astype(i32)[None, :],
        active.astype(i32)[None, :],
        jnp.zeros((4, B), i32),
    ], axis=0)                                       # (8, B)

    R = 3 + 5 * M + ((-(3 + 5 * M)) % 8)
    kernel = _make_kernel(L, M, blk, NBP)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((48, NBP), lambda b: (0, 0)),
                pl.BlockSpec((L // 2, blk), lambda b: (0, b)),
                pl.BlockSpec((8, blk), lambda b: (0, b)),
            ],
            out_specs=pl.BlockSpec((R, blk), lambda b: (0, b)),
            out_shape=jax.ShapeDtypeStruct((R, B), i32),
            interpret=interpret,
        )(_scal_row(primary, L2), tbl, qT, params)
    ret = out[0]
    n_mem = out[1]
    over = out[2] != 0
    m0 = out[3:3 + M].T
    m1 = out[3 + M:3 + 2 * M].T
    ms = out[3 + 2 * M:3 + 3 * M].T
    mqb = out[3 + 3 * M:3 + 4 * M].T
    mqe = out[3 + 4 * M:3 + 5 * M].T
    return ret, n_mem, m0, m1, ms, mqb, mqe, over


def superstep_pallas(tbl, primary, L2, q, qlen, min_intv, active,
                     split_len, split_width,
                     L: int, M: int, OUT_CAP: int,
                     NEED_X1: bool = True, interpret=None,
                     packed=False):
    """Drop-in twin of ops.smem.smem_superstep backed by the all-in-one
    Mosaic kernel.  Same returns: (o0, o1, os, oqb uint8, oqe uint8,
    n_out uint8, overflow bool)."""
    i32 = jnp.int32
    B = q.shape[0]
    blk = min(BLK, B)
    assert B % blk == 0, (B, blk)
    NBP = tbl.shape[1]

    qT = _pack_q(q, L, packed).T
    params = jnp.concatenate([
        qlen.astype(i32)[None, :],
        min_intv.astype(i32)[None, :],
        active.astype(i32)[None, :],
        split_len.astype(i32)[None, :],
        split_width.astype(i32)[None, :],
        jnp.zeros((3, B), i32),
    ], axis=0)                                       # (8, B)

    OC = OUT_CAP
    R = 2 + 5 * OC + ((-(2 + 5 * OC)) % 8)
    kernel = _make_superstep_kernel(L, M, blk, NBP, OC)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((48, NBP), lambda b: (0, 0)),
                pl.BlockSpec((L // 2, blk), lambda b: (0, b)),
                pl.BlockSpec((8, blk), lambda b: (0, b)),
            ],
            out_specs=pl.BlockSpec((R, blk), lambda b: (0, b)),
            out_shape=jax.ShapeDtypeStruct((R, B), i32),
            interpret=interpret,
        )(_scal_row(primary, L2), tbl, qT, params)
    n_out = out[0]
    over = out[1] != 0
    o0 = out[2:2 + OC].T
    o1 = (out[2 + OC:2 + 2 * OC].T if NEED_X1
          else jnp.zeros((1, 1), i32))
    os_ = out[2 + 2 * OC:2 + 3 * OC].T
    oqb = out[2 + 3 * OC:2 + 4 * OC].T
    oqe = out[2 + 4 * OC:2 + 5 * OC].T
    return (o0, o1, os_, oqb.astype(jnp.uint8), oqe.astype(jnp.uint8),
            n_out.astype(jnp.uint8), over)


# ---------------------------------------------------------------------------
# SA lookup: batched bwt_sa inverse-Psi walk (software/bwt.c:104-114)
# ---------------------------------------------------------------------------

# in-kernel sampled-SA finish cap: the slab-chunked (n_sa, blk) gather
# runs once per call; the resident byte planes cost 8 B/row
MAX_SA_ROWS = int(os.environ.get("BWAMEM_TPU_PALLAS_SA_ROWS",
                                 "262144"))


def sa_pallas_available(n_blocks: int, n_sa: int, cdt,
                        sa_intv: int = None) -> bool:
    if not _HAVE_PALLAS:
        return False
    flag = os.environ.get("BWAMEM_TPU_PALLAS_SMEM", "1")
    if flag == "0":
        return False
    if jax.default_backend() != "tpu" and flag != "force":
        return False
    # the walk kernel (like the XLA twin's mask) assumes a power-of-two
    # SA sampling interval; a non-pow2 sa_intv must take the host path
    if sa_intv is not None and (sa_intv & (sa_intv - 1)) != 0:
        return False
    return cdt == jnp.int32 and n_blocks <= MAX_BLOCKS \
        and n_sa <= MAX_SA_ROWS


def prep_sa_table(sa: jnp.ndarray) -> jnp.ndarray:
    """(n_sa,) int32 sampled SA -> (4, NSP) bf16 byte planes."""
    n = sa.shape[0]
    nsp = -(-n // 128) * 128
    s = sa.astype(jnp.uint32)
    t = jnp.stack([(s >> np.uint32(8 * p)) & np.uint32(0xFF)
                   for p in range(4)]).astype(jnp.bfloat16)
    if nsp != n:
        t = jnp.concatenate(
            [t, jnp.zeros((4, nsp - n), jnp.bfloat16)], axis=1)
    return t


def _make_sa_kernel(blk, NBP, NSP, sa_shift, max_steps,
                    gather_factory=None, sa_fetch_factory=None,
                    wide=False):
    """One inverse-Psi walk step = ONE occ-row gather: bwt_b0's word
    select and occ's popcounts share the row at (k - (k>primary)) >> 7
    (they differ only at k == primary / k == seq_len, where the result
    is overridden anyway — software/bwt.c:71-77,125-147).

    `gather_factory` as in _make_kernel; `sa_fetch_factory(sa_ref,
    scratch) -> sa_fetch` replaces the sampled-SA plane gather with
    sa_fetch(slot (1, blk)) -> (1, blk) coordinate values (the HBM DMA
    path).  wide=True walks radix-2^30 paired-plane coordinates
    (int64 genomes); params carry (k hi, k lo) rows and the output is
    (vals hi, vals lo, over)."""
    i32 = jnp.int32
    cw = _CW(wide)
    mask = np.int32((1 << sa_shift) - 1)
    assert sa_shift <= 30

    def kernel(sc_ref, tbl_ref, sa_ref, par_ref, out_ref, *scratch):
        primary, L2, seq_len = _read_scal(sc_ref, wide)
        if wide:
            k0 = (par_ref[0:1, :], par_ref[1:2, :])
        else:
            k0 = (par_ref[0:1, :],)

        gw = (gather_factory(tbl_ref, scratch)[0]
              if gather_factory is not None else None)
        sa_fetch = (sa_fetch_factory(sa_ref, scratch)
                    if sa_fetch_factory is not None else None)
        j8 = lax.broadcasted_iota(i32, (8, blk), 0)

        def walk_step(st):
            steps, it, done = st[-3:]
            k = st[:-3]
            act = (cw.andm(k, mask) != Z) & (done == Z)
            x = cw.subi(k, jnp.where(cw.lt(primary, k), ONE, Z))
            blkidx = cw.blkrow(x)
            if gw is None:
                rows = _gather_planes(tbl_ref, blkidx, NBP, blk)
                w = (rows[0:12]
                     | lax.shift_left(rows[12:24], np.int32(8))
                     | lax.shift_left(rows[24:36], np.int32(16))
                     | lax.shift_left(rows[36:48], np.int32(24)))
                ck = (w[0:4],)
                words = w[4:12]
            else:
                # sparse per-8-group skip once walks finish (lanes
                # exit at different psi depths)
                ck, words = gw(blkidx, live=jnp.where(act, ONE, Z))
            # bwt_B0: word (x>>4)&7, shift ((~x)&15)*2 — bits 0..6 of
            # x live entirely in the lo plane (2^30 ≡ 0 mod 128)
            xlo = x[-1]
            wi8 = lax.shift_right_logical(xlo, np.int32(4)) & np.int32(7)
            word = jnp.sum(jnp.where(j8 == wi8, words, Z), axis=0,
                           keepdims=True)
            sh = ((~xlo) & np.int32(15))
            c = lax.shift_right_logical(word, sh + sh) & np.int32(3)
            # occ(k, c): checkpoint + masked popcount at offset x&127
            off = xlo & np.int32(127)
            wi = lax.shift_right_logical(off, np.int32(4))
            r = (~off) & np.int32(15)
            pmask = ~(lax.shift_left(ONE, r + r) - ONE)
            wmask = jnp.where(j8 < wi, ALL1,
                              jnp.where(j8 == wi, pmask, Z))
            wv = words & wmask
            hb = lax.shift_right_logical(wv, ONE) & M55
            lb = wv & M55
            c3 = jnp.sum(_popc(hb & lb), axis=0, keepdims=True)
            c2 = jnp.sum(_popc(hb & ~lb), axis=0, keepdims=True)
            c1 = jnp.sum(_popc(lb & ~hb), axis=0, keepdims=True)
            c0 = (off + ONE) - c1 - c2 - c3

            def selc(v0, v1, v2, v3):
                return (jnp.where(c == Z, v0, Z)
                        + jnp.where(c == ONE, v1, Z)
                        + jnp.where(c == np.int32(2), v2, Z)
                        + jnp.where(c == np.int32(3), v3, Z))

            def cselc(vs):
                return cw.map(selc, *vs)

            occ = cselc([cw.addi(cw.row(ck, cc), cnt)
                         for cc, cnt in enumerate((c0, c1, c2, c3))])
            l2c = cselc([cw.map(lambda pz, sc: pz + sc,
                                cw.zeros((1, blk)), L2[cc])
                         for cc in range(4)])
            l2c1 = cselc([cw.map(lambda pz, sc: pz + sc,
                                 cw.zeros((1, blk)), L2[cc + 1])
                          for cc in range(4)])
            occ = cw.where(cw.eq(k, cw.map(
                lambda pz, sc: pz + sc, cw.zeros((1, blk)), seq_len)),
                cw.sub(l2c1, l2c), occ)
            nxt = cw.add(l2c, occ)
            k2 = cw.where(cw.eq(k, cw.map(
                lambda pz, sc: pz + sc, cw.zeros((1, blk)), primary)),
                cw.zeros((1, blk)), nxt)
            k = cw.where(act, k2, k)
            steps = steps + jnp.where(act, ONE, Z)
            done = jnp.where(cw.andm(k, mask) == Z, ONE, done)
            return k + (steps, it + ONE, done)

        def cond(st):
            it, done = st[-2], st[-1]
            return (jnp.max(jnp.where(done == Z, ONE, Z)) > Z) \
                & (it < np.int32(max_steps))

        done0 = jnp.where(cw.andm(k0, mask) == Z, ONE, Z)
        st = k0 + (jnp.zeros((1, blk), i32), Z, done0)
        st = lax.while_loop(cond, walk_step, st)
        k_fin, steps = st[:-3], st[-3]

        over = jnp.where(cw.andm(k_fin, mask) != Z, ONE, Z)
        si = cw.shr_i32(k_fin, sa_shift)
        if sa_fetch is None:
            sb = _gather_planes(sa_ref, si, NSP, blk)
            sa_val = ((sb[0:1] | lax.shift_left(sb[1:2], np.int32(8))
                       | lax.shift_left(sb[2:3], np.int32(16))
                       | lax.shift_left(sb[3:4], np.int32(24))),)
        else:
            sa_val = sa_fetch(si)
        vals = cw.addi(sa_val, steps)
        if wide:
            # -1 sentinel = (hi -1, lo 2^30-1): hi*2^30 + lo == -1
            vals = cw.where(over != Z, (jnp.full((1, blk), ALL1, i32),
                                        jnp.full((1, blk), M30, i32)),
                            vals)
            out_ref[0:1, :] = vals[0]
            out_ref[1:2, :] = vals[1]
            out_ref[2:3, :] = over
            out_ref[3:8, :] = jnp.zeros((5, blk), i32)
        else:
            out_ref[0:1, :] = jnp.where(over != Z, np.int32(-1),
                                        vals[0])
            out_ref[1:2, :] = over
            out_ref[2:8, :] = jnp.zeros((6, blk), i32)

    return kernel


@lru_cache(maxsize=None)
def _sa_walk_fn(B: int, blk: int, NBP: int, NSP: int, sa_shift: int,
                max_steps: int, interpret: bool):
    """Memoized jitted walk-kernel callable: rebuilding the pallas_call
    per invocation made every standalone dispatch a jit cache miss
    (fresh closure identity) and paid a full recompile (~0.6 s) —
    invisible in kernel-time accounting because it lands in the
    dispatch, not the result fetch.  (The VMEM variant used to carry
    its own jax.jit; routing both variants through one cached builder
    keeps the big twin's call signature identical.)"""
    i32 = jnp.int32
    kernel = _make_sa_kernel(blk, NBP, NSP, sa_shift, max_steps)

    def run(scal, tbl, sa_planes, params):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(B // blk,),
                in_specs=[
                    pl.BlockSpec((1, 8), lambda b: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((48, NBP), lambda b: (0, 0)),
                    pl.BlockSpec((4, NSP), lambda b: (0, 0)),
                    pl.BlockSpec((8, blk), lambda b: (0, b)),
                ],
                out_specs=pl.BlockSpec((8, blk), lambda b: (0, b)),
                out_shape=jax.ShapeDtypeStruct((8, B), i32),
                interpret=interpret,
            )(scal, tbl, sa_planes, params)

    return jax.jit(run)


def sa_lookup_pallas(tbl, sa_planes, primary, L2, seq_len, sa_intv: int,
                     k, max_steps: int = 1024, interpret=None):
    """Drop-in twin of ops.fm.sa_lookup_batched backed by the Mosaic
    walk kernel.  Returns (vals, overflowed) — identical values."""
    i32 = jnp.int32
    B = k.shape[0]
    blk = min(BLK, B)
    assert B % blk == 0, (B, blk)
    NBP = tbl.shape[1]
    NSP = sa_planes.shape[1]
    assert sa_intv & (sa_intv - 1) == 0, \
        f"sa_intv must be a power of two, got {sa_intv}"
    sa_shift = int(np.log2(sa_intv))

    params = jnp.concatenate([
        k.astype(i32)[None, :], jnp.zeros((7, B), i32)], axis=0)
    scal = jnp.concatenate([
        primary.astype(i32).reshape(1),
        L2.astype(i32).reshape(5),
        seq_len.astype(i32).reshape(1),
        jnp.zeros(1, i32)]).reshape(1, 8)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _sa_walk_fn(B, blk, NBP, NSP, sa_shift, max_steps,
                      bool(interpret))(scal, tbl, sa_planes, params)
    return out[0], out[1] != 0
