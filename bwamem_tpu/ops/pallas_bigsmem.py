"""HBM-resident big-table SMEM kernels: per-step DMA-wave gathers.

The reference's core design point is an occ table too big for on-chip
memory: the FPGA keeps the 3 GB BWT/occ array in host DRAM and fetches
two 64-byte blocks per extension step over CCI-P on demand
(hardware/afu_core.v:1428-1432, software/HelloALINLB.cpp:59-63).  The
VMEM-resident one-hot gather of ops.pallas_smem scales O(n_blocks) per
lookup and dies past ~24k blocks (~1.5 Mbp); the XLA native row gather
is ~1.7 us/row serialized.  This module is the TPU-native analog of
the FPGA's on-demand fetch: the occ table stays in HBM as 512-byte
rows (8 consecutive 64-byte occ blocks — Mosaic DMAs must be 128-lane
aligned), and each extension step issues one async row DMA per lane,
all in flight together, then selects the 16-word block within the
fetched row.  Measured on v5e (tools/microbench_dmawave.py): a
256-lane wave costs ~8.5 us/step including the VMEM->SMEM index bounce
(~20 ns marginal per DMA), INDEPENDENT of table size — the crossover
vs the one-hot path is a few thousand blocks, and vs the XLA path it
is ~100x at 4 Mbp scale.

Only the gather differs from the ops.pallas_smem kernels: the full
iterator/merge/output machinery is shared via the gather_factory hooks
of _make_kernel/_make_superstep_kernel/_make_sa_kernel, so parity is
inherited from the same traced program.

Coordinates: int32 genomes run single-plane; int64 genomes (the
canonical 3 Gbp human regime, software/bwa.c:286-301) run the WIDE
radix-2^30 (hi, lo) paired-plane kernels — the 64-bit occ checkpoints
already ride the 512 B rows as lo/hi word pairs, and the sampled SA
packs as lo/hi lane pairs (prep_sa_wide).  Callers gate with
smem1_pallas_big_available(); BWAMEM_TPU_PALLAS_BIGSMEM64=0 falls back
to the emulated-int64 XLA twin (measured 2.4x slower at 64 Mbp).

The backward-chunk waves software-pipeline across two buffer slots
(chunk c+1's row DMAs fly under chunk c's popcount math,
BWAMEM_TPU_BIG_PIPE=0 disables).
"""

import os
from functools import lru_cache

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

from .pallas_smem import (Z, ONE, BLK, _OC2, _CW, M30, _make_kernel,
                          _make_superstep_kernel, _make_sa_kernel,
                          _pack_q, _scal_row)

# backward-pass chunk width (rows of the prev-interval list sharing one
# DMA wave); must divide M.  Bigger MC = fewer index bounces but wider
# (often mostly-dead) waves — measured at 4 Mbp/B=2048: MC=1 120.6 ms,
# MC=2 117.0 ms, MC=4 129.3 ms per superstep.  Read at call time so
# in-process A/Bs (tools/ab_superstep.py) can flip it per trace.
def MC_BIG():
    return int(os.environ.get("BWAMEM_TPU_BIG_MC", "2"))


def smem1_pallas_big_available(n_blocks: int, cdt, L: int, M: int,
                               out_cap: int = 48) -> bool:
    """Feasibility gate (no table-size cap: that is the point).  The
    caller picks big-vs-VMEM by n_blocks (pallas_smem.MAX_BLOCKS).
    int64 genomes (the canonical 3 Gbp human regime) run the WIDE
    radix-2^30 paired-plane kernels; gate BWAMEM_TPU_PALLAS_BIGSMEM64=0
    to fall back to the emulated-int64 XLA twin."""
    if not _HAVE_PALLAS:
        return False
    flag = os.environ.get("BWAMEM_TPU_PALLAS_BIGSMEM", "1")
    if flag == "0":
        return False
    if jax.default_backend() != "tpu" and flag != "force":
        return False
    if cdt != jnp.int32:
        if cdt != jnp.int64:
            return False
        if os.environ.get("BWAMEM_TPU_PALLAS_BIGSMEM64", "1") == "0":
            return False
    # L == 512: the long-fragment bucket (radix-1024 merge key, int32
    # qb/qe wire) — a capability the reference's accelerator lacks
    # entirely (101-byte query BRAM, hardware/afu_core.v:4437-4441)
    return (L % 32 == 0 and L <= 512 and M <= 32
            and 2 * M <= _OC2 and out_cap <= _OC2)


def sa_pallas_big_available(cdt, sa_intv: int) -> bool:
    if not _HAVE_PALLAS:
        return False
    flag = os.environ.get("BWAMEM_TPU_PALLAS_BIGSMEM", "1")
    if flag == "0":
        return False
    if jax.default_backend() != "tpu" and flag != "force":
        return False
    if cdt == jnp.int64 \
            and os.environ.get("BWAMEM_TPU_PALLAS_BIGSMEM64", "1") == "0":
        return False
    return cdt in (jnp.int32, jnp.int64) \
        and (sa_intv & (sa_intv - 1)) == 0


def prep_table_wide(blocks: jnp.ndarray) -> jnp.ndarray:
    """(n_blocks, 16) uint32 occ table -> (ceil(n/8), 128) int32 wide
    rows (8 blocks = 512 bytes each, the Mosaic DMA alignment unit).
    Stays in HBM; one reshape, no byte planes.  Tables uploaded in the
    wide layout (ops.fm big-table default — the (n, 16) layout tiles
    8x in HBM) pass through untouched."""
    if blocks.shape[1] == 128:
        return blocks
    nb = blocks.shape[0]
    pad = (-nb) % 8
    b = blocks
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 16), blocks.dtype)])
    return lax.bitcast_convert_type(b.reshape(-1, 128), jnp.int32)


def prep_sa_wide(sa: jnp.ndarray) -> jnp.ndarray:
    """(n_sa,) sampled SA -> (rows, 128) int32 wide rows.  int32 SA:
    128 entries/row.  int64 SA (wide kernels): entries bitcast to
    little-endian (lo32, hi32) int32 pairs — 64 entries/row, entry j
    of row at lanes (2j, 2j+1)."""
    if sa.dtype == jnp.int64:
        s = lax.bitcast_convert_type(sa, jnp.int32).reshape(-1)
    else:
        s = sa.astype(jnp.int32)
    n = s.shape[0]
    pad = (-n) % 128
    if pad:
        s = jnp.concatenate([s, jnp.zeros(pad, jnp.int32)])
    return s.reshape(-1, 128)


def _sparse() -> bool:
    """Sparse-wave gate (BWAMEM_TPU_BIG_SPARSE, default OFF): skip
    whole-dead 8-lane groups at issue and drain time.  MEASURED A
    LOSS at 256 Mbp (888 vs 818 ms/superstep, tools/ab_superstep.py):
    dead lanes all fetch row 0, which stays row-buffer-resident, so
    the skipped fetches were nearly free while the per-group drain
    gives up the one-wait economics.  Kept as an A/B knob."""
    return os.environ.get("BWAMEM_TPU_BIG_SPARSE", "0") != "0"


_logged_configs = set()


def _log_config_once(msg: str) -> None:
    """One trace-time stderr line per kernel configuration, so bench
    logs prove which path (halves/MC/wide) actually engaged."""
    if msg not in _logged_configs:
        _logged_configs.add(msg)
        import sys
        sys.stderr.write(f"[pallas_bigsmem] {msg}\n")


# semaphore space is tiny (2 KB): cap the DMA-sem array and cycle.
# Sharing a semaphore across equal-size copies is sound — the counter
# accumulates completions and each wait drains exactly one copy's bytes
_NSEM = int(os.environ.get("BWAMEM_TPU_BIG_NSEM", "256"))


def _scratch_shapes(Cmax: int, slots: int = 1):
    """DMA-wave scratch: per-slot (idxv, idxs, rows) buffer triples,
    then one wave DMA semaphore per slot and the per-slot index-bounce
    semaphores.  All of a wave's row copies signal the slot's SINGLE
    semaphore: equal-size copies make per-copy waits interchangeable,
    and the drain collapses to ONE wait for the wave's total bytes
    (a dummy descriptor over the whole row buffer) — half the
    scalar-core work per wave vs per-copy draining.  slots=2 lets two
    waves be in flight (the backward-chunk pipeline); separate buffers
    per slot — Mosaic cannot slice sub-tile rows out of one stacked
    buffer.

    The index buffers carry TWO rows: row 0 the per-lane row ids, row
    1 the 8-lane-GROUP liveness flags (sparse waves: a whole-dead
    group's 8 DMAs are skipped with one scalar branch — the per-DMA
    skip measured a loss in round 4, but late iterator rounds run
    almost-empty waves, a 3.7x lockstep inflation on real reads)."""
    out = []
    for _ in range(slots):
        out += [
            pltpu.VMEM((2, Cmax), jnp.int32),   # row ids + group flags
            pltpu.SMEM((2, Cmax), jnp.int32),   # scalar-side copy
            pltpu.VMEM((Cmax, 128), jnp.int32),  # fetched 512-B rows
        ]
    out += [
        pltpu.SemaphoreType.DMA((slots,)),      # wave sems (1/slot)
        pltpu.SemaphoreType.DMA((slots,)),      # index-bounce sems
    ]
    return out


def _split_scratch(scratch):
    """scratch -> ([(idxv, idxs, rows) per slot], sems, bsem)."""
    sems, bsem = scratch[-2], scratch[-1]
    bufs = scratch[:-2]
    assert len(bufs) % 3 == 0
    slots = [tuple(bufs[3 * s:3 * s + 3]) for s in range(len(bufs) // 3)]
    return slots, sems, bsem


def _wave_cp(tbl_ref, idxs, rows, sems, slot: int, j):
    """The j-th row copy of slot's wave (all copies share the slot's
    semaphore; equal sizes make waits interchangeable)."""
    return pltpu.make_async_copy(
        tbl_ref.at[pl.ds(idxs[0, j], 1), :],
        rows.at[pl.ds(j, 1), :],
        sems.at[slot])


def _group_flags(live, C: int):
    """(1, C) lane liveness -> (1, C) row where lane 8g holds the OR
    of lanes 8g..8g+7 (3 log-rolls; wraparound can only turn a flag ON
    spuriously at the last group — extra fetches, never a miss).
    pltpu.roll takes nonnegative shifts (lane j reads j-s), so the
    "look ahead by s" roll is C - s."""
    f = jnp.where(live, ONE, Z)
    for sh in (1, 2, 4):
        f = f | pltpu.roll(f, C - sh, axis=1)
    return f


def _wave_start(tbl_ref, idxv, idxs, rows, sems, bsem, rowi, C: int,
                slot: int = 0, n_slots: int = 1, pair: bool = False,
                live=None):
    """Launch one DMA wave into slot's buffers: rows[j] =
    tbl[rowi[0, j]] for j < C.  The per-lane indices are VPU vectors;
    DMA starts need scalars, so they bounce VMEM -> SMEM first (one
    small DMA), then a scalar loop issues all C row copies — the
    copies fly together, ~20 ns marginal each.  Two slots can be in
    flight (the backward-chunk pipeline); per-slot semaphore ranges
    keep their completions separate.

    live (optional, (1, C) bool/int32): SPARSE wave — 8-lane groups
    with no live lane are skipped with ONE scalar branch per group
    (flag row bounced alongside the ids).  Late iterator rounds run
    almost-empty waves (measured 3.7x lockstep inflation on real 101 bp
    reads at 256 Mbp), where the per-DMA skip of round 4 lost to
    branch cost but the per-GROUP skip amortizes it 8x.

    pair=True: the wave carries bwt_2occ4 pairs — lane j >= C/2 is
    the l-side of lane j - C/2's k-side (extendT's cat layout), and
    once the interval shrinks below the 1024-base row span the two
    sides usually share a row.  Duplicate second-half DMAs are skipped
    (the caller repairs rows via a lane roll) — the 2occ4 same-block
    fusion of software/bwt.c:217-242 at row granularity."""
    del n_slots
    U = 8
    assert C % U == 0, (C, U)
    sparse = live is not None and not pair
    idxv[0:1, 0:C] = rowi
    if sparse:
        idxv[1:2, 0:C] = _group_flags(live, C)
    else:
        # the flag row still rides the bounce: a 1-row slice of the
        # (2, Cmax) buffer violates the (2, 128) VMEM tiling on
        # hardware, and 2 KB extra on an on-chip copy is free
        idxv[1:2, 0:C] = jnp.ones((1, C), jnp.int32)
    cpb = pltpu.make_async_copy(idxv.at[pl.ds(0, 2), pl.ds(0, C)],
                                idxs.at[pl.ds(0, 2), pl.ds(0, C)],
                                bsem.at[slot])
    cpb.start()
    cpb.wait()

    def _cp(j):
        return _wave_cp(tbl_ref, idxs, rows, sems, slot, j)

    # issue in 8-unrolled scalar loops: a plain fori_loop pays ~20 ns
    # per iteration of loop overhead on the scalar core — at 2*C
    # iterations that DOUBLED the wave cost (measured 20 us vs 9 us per
    # 256-DMA step, tools/microbench_bigsmem.py gw)
    if sparse:
        def issue_s(j8, c):
            @pl.when(idxs[1, j8 * np.int32(U)] != Z)
            def _():
                for u in range(U):
                    _cp(j8 * np.int32(U) + np.int32(u)).start()
            return c

        lax.fori_loop(0, C // U, issue_s, 0)
        return

    if not pair:
        def issue(j8, c):
            for u in range(U):
                _cp(j8 * np.int32(U) + np.int32(u)).start()
            return c

        lax.fori_loop(0, C // U, issue, 0)
        return

    H = C // 2
    assert H % U == 0, (C, U)

    def issue1(j8, c):
        for u in range(U):
            _cp(j8 * np.int32(U) + np.int32(u)).start()
        return c

    lax.fori_loop(0, H // U, issue1, 0)

    def issue2(j8, c):
        for u in range(U):
            j = np.int32(H) + j8 * np.int32(U) + np.int32(u)

            @pl.when(idxs[0, j] != idxs[0, j - np.int32(H)])
            def _():
                _cp(j).start()
        return c

    lax.fori_loop(0, H // U, issue2, 0)


def _wave_drain(tbl_ref, idxv, idxs, rows, sems, bsem, C: int,
                slot: int = 0, n_slots: int = 1, pair: bool = False,
                live=None):
    """Wait out slot's in-flight wave (counterpart of _wave_start).
    All C copies signal the slot's single semaphore, so the whole wave
    drains in ONE wait sized as C rows (a dummy descriptor over the
    row buffer) — the per-copy drain loop was half the wave's
    scalar-core cost.  Sparse waves (live is not None) wait per LIVE
    group under the same bounced flags the start used.  pair mode
    still waits per copy (its skip predicate makes the wave's total
    byte count data-dependent)."""
    del n_slots
    U = 8

    def _cp(j):
        return _wave_cp(tbl_ref, idxs, rows, sems, slot, j)

    if live is not None and not pair:
        # per-live-group waits under the same bounced flags the issue
        # used (pltpu.semaphore_wait refuses DMA semaphores, so a
        # single dynamic-byte wait is unavailable)
        def drain_s(j8, c):
            @pl.when(idxs[1, j8 * np.int32(U)] != Z)
            def _():
                pltpu.make_async_copy(
                    rows.at[pl.ds(0, U), :],
                    rows.at[pl.ds(0, U), :],
                    sems.at[slot]).wait()
            return c

        lax.fori_loop(0, C // U, drain_s, 0)
        return

    if not pair:
        pltpu.make_async_copy(rows.at[pl.ds(0, C), :],
                              rows.at[pl.ds(0, C), :],
                              sems.at[slot]).wait()
        return

    H = C // 2

    def drain1(j8, c):
        for u in range(U):
            _cp(j8 * np.int32(U) + np.int32(u)).wait()
        return c

    lax.fori_loop(0, H // U, drain1, 0)

    def drain2(j8, c):
        for u in range(U):
            j = np.int32(H) + j8 * np.int32(U) + np.int32(u)

            @pl.when(idxs[0, j] != idxs[0, j - np.int32(H)])
            def _():
                _cp(j).wait()
        return c

    lax.fori_loop(0, H // U, drain2, 0)


def _wave(tbl_ref, idxv, idxs, rows, sems, bsem, rowi, C: int,
          slot: int = 0, n_slots: int = 1, pair: bool = False,
          live=None):
    """Synchronous wave: start + drain (the non-pipelined call sites)."""
    _wave_start(tbl_ref, idxv, idxs, rows, sems, bsem, rowi, C,
                slot=slot, n_slots=n_slots, pair=pair, live=live)
    _wave_drain(tbl_ref, idxv, idxs, rows, sems, bsem, C,
                slot=slot, n_slots=n_slots, pair=pair, live=live)


def _dma_factory(Cmax: int, MC: int, wide: bool = False,
                 dedup: bool = False):
    """gather_factory for the pallas_smem kernel makers: per call,
    fetch each lane's 512-byte row and cut out its 16-word occ block,
    returning (ck coordinate (4, C), bwt words (8, C)).  wide=True
    converts the 64-bit checkpoints (lo/hi word pairs riding the same
    rows) to radix-2^30 paired planes — the int64-genome path.
    dedup=True skips second-half DMAs whose row matches the paired
    first-half lane (extendT's k/l layout) and repairs by lane roll."""
    cw = _CW(wide)

    def factory(tbl_ref, scratch):
        slot_bufs, sems, bsem = _split_scratch(scratch)
        n_slots = len(slot_bufs)

        def _rowi(blkidx):
            # arithmetic shift keeps any negative marker negative (a
            # logical shift would turn it into a huge in-range-looking
            # row id -> out-of-bounds DMA; interpret silently clamps,
            # the chip faults)
            return lax.shift_right_arithmetic(blkidx, np.int32(3))

        def gather_start(blkidx, slot=0, guard=None, live=None):
            C = blkidx.shape[1]
            assert C <= Cmax, (C, Cmax)
            idxv, idxs, rows = slot_bufs[slot]

            def _go():
                _wave_start(tbl_ref, idxv, idxs, rows, sems, bsem,
                            _rowi(blkidx), C, slot=slot,
                            n_slots=n_slots, pair=dedup,
                            live=live if _sparse() else None)
            if guard is None:
                _go()
            else:
                # per-WAVE skip for a dead dual half (the per-DMA
                # branch variant measured a loss; one scalar branch
                # per 2*blk DMAs is noise)
                pl.when(guard)(_go)

        def gather_finish(blkidx, slot=0, guard=None, live=None):
            C = blkidx.shape[1]
            rowi = _rowi(blkidx)
            sub = blkidx & np.int32(7)
            idxv, idxs, rows = slot_bufs[slot]

            def _go():
                _wave_drain(tbl_ref, idxv, idxs, rows, sems, bsem, C,
                            slot=slot, n_slots=n_slots, pair=dedup,
                            live=live if _sparse() else None)
            if guard is None:
                _go()
            else:
                # guarded by the SAME predicate as the start (a wait
                # with no matching wave would hang); the tail below
                # then reads stale rows, masked by the half's done
                pl.when(guard)(_go)
            rT = rows[0:C, :].T                       # (128, C)
            if dedup:
                H = C // 2
                rolled = pltpu.roll(rT, H, axis=1)
                rro = pltpu.roll(rowi, H, axis=1)
                lanepos = lax.broadcasted_iota(jnp.int32, (1, C), 1)
                same = (lanepos >= np.int32(H)) & (rowi == rro)
                rT = jnp.where(same, rolled, rT)
            wf = jnp.zeros((16, C), jnp.int32)
            for g in range(8):
                wf = wf + jnp.where(sub == np.int32(g),
                                    rT[g * 16:(g + 1) * 16, :], Z)
            wlo = jnp.concatenate(
                [wf[0:1], wf[2:3], wf[4:5], wf[6:7]], axis=0)
            words = wf[8:16]
            if not wide:
                # hi checkpoint words are zero for int32 genomes
                return (wlo,), words
            whi = jnp.concatenate(
                [wf[1:2], wf[3:4], wf[5:6], wf[7:8]], axis=0)
            return cw.from_ck(wlo, whi), words

        def gather_words(blkidx, live=None):
            gather_start(blkidx, 0, live=live)
            return gather_finish(blkidx, 0, live=live)

        return (gather_words, MC,
                (gather_start, gather_finish) if n_slots >= 2 else None)

    return factory


def _sa_fetch_factory(blk: int, wide: bool = False):
    """sa_fetch_factory for _make_sa_kernel: fetch the wide row holding
    each lane's sampled-SA slot and select its lane.  wide=True reads
    int64 entries as (lo32, hi32) lane pairs (prep_sa_wide layout) and
    returns radix-2^30 paired planes."""
    cw = _CW(wide)

    def factory(sa_ref, scratch):
        slot_bufs, sems, bsem = _split_scratch(scratch)
        idxv, idxs, rows = slot_bufs[0]

        def sa_fetch(si):                              # (1, blk)
            if wide:
                rowi = lax.shift_right_logical(si, np.int32(6))
                lanei = (si & np.int32(63)) * np.int32(2)
            else:
                rowi = lax.shift_right_logical(si, np.int32(7))
                lanei = si & np.int32(127)
            _wave(sa_ref, idxv, idxs, rows, sems, bsem, rowi, blk)
            rT = rows[0:blk, :].T                      # (128, blk)
            sl = lax.broadcasted_iota(jnp.int32, (128, blk), 0)
            lo32 = jnp.sum(jnp.where(sl == lanei, rT, Z), axis=0,
                           keepdims=True)
            if not wide:
                return (lo32,)
            hi32 = jnp.sum(jnp.where(sl == lanei + ONE, rT, Z), axis=0,
                           keepdims=True)
            return cw.from_ck(lo32, hi32)

        return sa_fetch

    return factory


def _pick_mc(M: int) -> int:
    mc = max(1, min(M, MC_BIG()))
    while M % mc:
        mc -= 1
    return mc


_M30_64 = np.int64((1 << 30) - 1)


def _split30(v):
    """int64 array -> (hi, lo) int32 radix-2^30 planes (host-side XLA,
    before the x64-disabled pallas_call)."""
    v = v.astype(jnp.int64)
    return ((v >> np.int64(30)).astype(jnp.int32),
            (v & _M30_64).astype(jnp.int32))


def _join30(hi, lo):
    """(hi, lo) int32 planes -> int64 (hi*2^30 + lo)."""
    return hi.astype(jnp.int64) * np.int64(1 << 30) + lo.astype(jnp.int64)


def _scal_row_wide(primary, L2, seq_len=None):
    """(1, 16) scalar row: primary hi/lo, L2[0..4] hi/lo, seq_len
    hi/lo, pad (the wide twin of pallas_smem._scal_row)."""
    vals = [primary.astype(jnp.int64).reshape(1),
            L2.astype(jnp.int64).reshape(5)]
    if seq_len is not None:
        vals.append(seq_len.astype(jnp.int64).reshape(1))
    v = jnp.concatenate(vals)
    hi = (v >> np.int64(30)).astype(jnp.int32)
    lo = (v & _M30_64).astype(jnp.int32)
    row = jnp.stack([hi, lo], axis=1).reshape(-1)
    pad = 16 - row.shape[0]
    return jnp.concatenate([row, jnp.zeros(pad, jnp.int32)]).reshape(1, 16)


def _is_wide(L2) -> bool:
    return L2.dtype == jnp.int64


def _common_specs(L, blk, wide=False):
    return [
        pl.BlockSpec((1, 16 if wide else 8), lambda b: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((L // 2, blk), lambda b: (0, b)),
        pl.BlockSpec((8, blk), lambda b: (0, b)),
    ]


def smem1_pallas_big(tblw, primary, L2, q, qlen, x, min_intv, active,
                     L: int, M: int, interpret=None, packed=False):
    """Drop-in twin of pallas_smem.smem1_pallas backed by the DMA-wave
    gather; `tblw` is prep_table_wide(blocks).  int64 L2/coordinates
    run the wide paired-plane kernel and return int64 m0/m1/ms."""
    i32 = jnp.int32
    wide = _is_wide(L2)
    B = q.shape[0]
    blk = min(BLK, B)
    assert B % blk == 0, (B, blk)
    MC = _pick_mc(M)
    Cmax = 2 * MC * blk

    qT = _pack_q(q, L, packed).T
    if wide:
        mi_hi, mi_lo = _split30(min_intv)
        params = jnp.concatenate([
            qlen.astype(i32)[None, :],
            x.astype(i32)[None, :],
            mi_hi[None, :], mi_lo[None, :],
            active.astype(i32)[None, :],
            jnp.zeros((3, B), i32),
        ], axis=0)
        scal = _scal_row_wide(primary, L2)
    else:
        params = jnp.concatenate([
            qlen.astype(i32)[None, :],
            x.astype(i32)[None, :],
            min_intv.astype(i32)[None, :],
            active.astype(i32)[None, :],
            jnp.zeros((4, B), i32),
        ], axis=0)
        scal = _scal_row(primary, L2)

    ncp = 2 if wide else 1
    R = 3 + (3 * ncp + 2) * M
    R += (-R) % 8
    dedup = os.environ.get("BWAMEM_TPU_BIG_DEDUP", "0") != "0"
    slots = 2 if os.environ.get("BWAMEM_TPU_BIG_PIPE", "1") != "0" \
        else 1
    kernel = _make_kernel(L, M, blk, 128,
                          gather_factory=_dma_factory(Cmax, MC, wide,
                                                      dedup),
                          wide=wide)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(B // blk,),
            in_specs=_common_specs(L, blk, wide),
            out_specs=pl.BlockSpec((R, blk), lambda b: (0, b)),
            out_shape=jax.ShapeDtypeStruct((R, B), i32),
            scratch_shapes=_scratch_shapes(Cmax, slots),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(scal, tblw, qT, params)
    ret = out[0]
    n_mem = out[1]
    over = out[2] != 0
    r = 3
    coords = []
    for _ in range(3):
        if wide:
            hi = out[r:r + M].T
            lo = out[r + M:r + 2 * M].T
            coords.append(_join30(hi, lo))
            r += 2 * M
        else:
            coords.append(out[r:r + M].T)
            r += M
    m0, m1, ms = coords
    mqb = out[r:r + M].T
    mqe = out[r + M:r + 2 * M].T
    return ret, n_mem, m0, m1, ms, mqb, mqe, over


def superstep_pallas_big(tblw, primary, L2, q, qlen, min_intv, active,
                         split_len, split_width,
                         L: int, M: int, OUT_CAP: int,
                         NEED_X1: bool = True, interpret=None,
                         packed=False):
    """Drop-in twin of pallas_smem.superstep_pallas for HBM-resident
    tables.  Same returns; int64 L2 runs the wide kernel and returns
    int64 o0/o1/os."""
    i32 = jnp.int32
    wide = _is_wide(L2)
    B = q.shape[0]
    blk = min(BLK, B)
    assert B % blk == 0, (B, blk)
    MC = _pick_mc(M)
    Cmax = 2 * MC * blk

    qT = _pack_q(q, L, packed).T
    if wide:
        mi_hi, mi_lo = _split30(min_intv)
        params = jnp.concatenate([
            qlen.astype(i32)[None, :],
            mi_hi[None, :], mi_lo[None, :],
            active.astype(i32)[None, :],
            split_len.astype(i32)[None, :],
            split_width.astype(i32)[None, :],
            jnp.zeros((2, B), i32),
        ], axis=0)
        scal = _scal_row_wide(primary, L2)
    else:
        params = jnp.concatenate([
            qlen.astype(i32)[None, :],
            min_intv.astype(i32)[None, :],
            active.astype(i32)[None, :],
            split_len.astype(i32)[None, :],
            split_width.astype(i32)[None, :],
            jnp.zeros((3, B), i32),
        ], axis=0)
        scal = _scal_row(primary, L2)

    OC = OUT_CAP
    ncp = 2 if wide else 1
    R = 2 + (3 * ncp + 2) * OC
    R += (-R) % 8
    dedup = os.environ.get("BWAMEM_TPU_BIG_DEDUP", "0") != "0"
    pipe = os.environ.get("BWAMEM_TPU_BIG_PIPE", "1") != "0"
    slots = 2 if pipe else 1
    # dual-half wave interleaving (BWAMEM_TPU_BIG_HALVES, default 2):
    # H independent blk-lane halves per kernel instance, their DMA
    # waves concurrently in flight on 2H scratch slots — hides the
    # HBM row-fetch latency that dominates big-table supersteps
    # (measured 1.88x wave overlap at H=2, gwk microbench)
    halves = int(os.environ.get("BWAMEM_TPU_BIG_HALVES", "2"))
    if not pipe or halves < 1 or B % (halves * blk) != 0:
        halves = 1
    W = halves * blk
    if halves > 1:
        slots = 2 * halves
    _log_config_once(f"superstep B={B} blk={blk} halves={halves} "
                     f"MC={MC} wide={wide} L={L}")
    kernel = _make_superstep_kernel(
        L, M, blk, 128, OC,
        gather_factory=_dma_factory(Cmax, MC, wide, dedup),
        wide=wide, halves=halves)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(B // W,),
            in_specs=_common_specs(L, W, wide),
            out_specs=pl.BlockSpec((R, W), lambda b: (0, b)),
            out_shape=jax.ShapeDtypeStruct((R, B), i32),
            scratch_shapes=_scratch_shapes(Cmax, slots),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(scal, tblw, qT, params)
    n_out = out[0]
    over = out[1] != 0
    r = 2
    coords = []
    for _ in range(3):
        if wide:
            hi = out[r:r + OC].T
            lo = out[r + OC:r + 2 * OC].T
            coords.append(_join30(hi, lo))
            r += 2 * OC
        else:
            coords.append(out[r:r + OC].T)
            r += OC
    o0, o1, os_ = coords
    if not NEED_X1:
        o1 = jnp.zeros((1, 1), o0.dtype)
    oqb = out[r:r + OC].T
    oqe = out[r + OC:r + 2 * OC].T
    # query coords ride uint8 for the classic buckets; the 512 bp
    # bucket's values reach 512, so its wire stays int32
    wdt = jnp.uint8 if L <= 256 else jnp.int32
    return (o0, o1, os_, oqb.astype(wdt), oqe.astype(wdt),
            n_out.astype(jnp.uint8), over)


def sa_lookup_pallas_big(tblw, saw, primary, L2, seq_len, sa_intv: int,
                         k, max_steps: int = 1024, interpret=None):
    """Drop-in twin of pallas_smem.sa_lookup_pallas for HBM-resident
    tables; `saw` is prep_sa_wide(sa).  int64 L2 runs the wide walk
    (int64 keys/values)."""
    i32 = jnp.int32
    wide = _is_wide(L2)
    B = k.shape[0]
    blk = min(BLK, B)
    assert B % blk == 0, (B, blk)
    assert sa_intv & (sa_intv - 1) == 0, \
        f"sa_intv must be a power of two, got {sa_intv}"
    sa_shift = int(np.log2(sa_intv))

    if wide:
        k_hi, k_lo = _split30(k)
        params = jnp.concatenate([
            k_hi[None, :], k_lo[None, :], jnp.zeros((6, B), i32)],
            axis=0)
        scal = _scal_row_wide(primary, L2, seq_len)
    else:
        params = jnp.concatenate([
            k.astype(i32)[None, :], jnp.zeros((7, B), i32)], axis=0)
        scal = jnp.concatenate([
            primary.astype(i32).reshape(1),
            L2.astype(i32).reshape(5),
            seq_len.astype(i32).reshape(1),
            jnp.zeros(1, i32)]).reshape(1, 8)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _sa_walk_big_fn(B, blk, sa_shift, max_steps,
                          bool(interpret), wide)(scal, tblw, saw, params)
    if wide:
        return _join30(out[0], out[1]), out[2] != 0
    return out[0], out[1] != 0


@lru_cache(maxsize=None)
def _sa_walk_big_fn(B: int, blk: int, sa_shift: int, max_steps: int,
                    interpret: bool, wide: bool = False):
    """Memoized jitted big-walk callable (see pallas_smem._sa_walk_fn:
    per-invocation pallas_call construction made every standalone
    dispatch recompile)."""
    i32 = jnp.int32
    kernel = _make_sa_kernel(
        blk, 128, 128, sa_shift, max_steps,
        gather_factory=_dma_factory(2 * blk, 1, wide),
        sa_fetch_factory=_sa_fetch_factory(blk, wide),
        wide=wide)
    sw = 16 if wide else 8

    def run(scal, tblw, saw, params):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(B // blk,),
                in_specs=[
                    pl.BlockSpec((1, sw), lambda b: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((8, blk), lambda b: (0, b)),
                ],
                out_specs=pl.BlockSpec((8, blk), lambda b: (0, b)),
                out_shape=jax.ShapeDtypeStruct((8, B), i32),
                scratch_shapes=_scratch_shapes(2 * blk),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
                interpret=interpret,
            )(scal, tblw, saw, params)

    return jax.jit(run)
