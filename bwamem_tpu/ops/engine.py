"""TPU seeding engine: pluggable into core.pipeline.process_seqs.

Replaces the reference's manager-thread + FPGA dispatch machinery
(software/fastmap.c:320-429) with direct batched device kernels — the
TPU is not a contended single accelerator, so the handshake mailbox
disappears and the dispatch loop simply keeps the chip busy
(SURVEY.md §2.4).

Reads longer than the engine's static length cap run entirely through
the host oracle path, mirroring the reference's hardware read-length cap
with CPU fallback (101-byte query buffers, software/bwt.c:575).
"""

from typing import List

import numpy as np

from .fm import DeviceFmIndex
from .seeding import BatchedSeeder


# fixed wave width: one compiled shape per kernel (see ops.seeding.LANES)
import os as _os
WAVE = int(_os.environ.get("BWAMEM_TPU_WAVE", "512"))
# below this many live requests a dispatch round trip costs more than
# the scalar oracle; the tail of the lock-step waves runs on the host.
# The native C++ kernels (oracle/nksw.py, ~50us per scalar extension)
# move the break-even far above the pure-Python oracle's (~35ms device
# RTT buys ~hundreds of native scalar calls)
def _default_min_wave() -> int:
    try:
        from ..oracle.ksw import _native
        return 64 if _native() else 8
    except Exception:
        return 8


MIN_WAVE = int(_os.environ.get("BWAMEM_TPU_MIN_WAVE", "0")) \
    or _default_min_wave()
# speculative up-front extension waves (A/B knob; default on)
SPECULATE = _os.environ.get("BWAMEM_TPU_SPECULATE", "1") != "0"
# per-stage wave widths: both SW waves are upload/RTT-bound now that
# their kernels are Pallas (extension 1.8ms, global 0.25ms per kilolane
# on-device), so wider waves mean fewer ~35ms round trips
WAVE_EXT = int(_os.environ.get("BWAMEM_TPU_WAVE_EXT", str(WAVE * 2)))
WAVE_GLO = int(_os.environ.get("BWAMEM_TPU_WAVE_GLO", str(WAVE * 2)))
# extension target-length buckets (must end at the engine LT cap)
LT_BUCKETS = tuple(int(x) for x in _os.environ.get(
    "BWAMEM_TPU_LT_BUCKETS", "160,320,544").split(","))
# long-read bucket (chunks whose longest read exceeds the 128 bp LQ):
# the query side widens to 256 and the target cap scales with it
LT_BUCKETS_LONG = tuple(int(x) for x in _os.environ.get(
    "BWAMEM_TPU_LT_BUCKETS_LONG", "320,544,800").split(","))
# 512 bp long-fragment chunks: flank targets reach query+2w+margin
LT_BUCKETS_XL = tuple(int(x) for x in _os.environ.get(
    "BWAMEM_TPU_LT_BUCKETS_XL", "576,1056").split(","))


def _pack4(buf: np.ndarray) -> np.ndarray:
    """Two bases per byte for the host->device hop (values 0..4)."""
    return buf[:, 0::2] | (buf[:, 1::2] << 4)


class ExtCache(dict):
    """Speculative extension results: content-keyed dict (consumed by
    drive_waves) plus `.outs`, the same results positionally aligned
    with the flattened (read, chain, seed) order (consumed by the
    native region builder)."""
    outs = None


class ChainBatch(list):
    """chain_batch's result: per-read Chain-object lists (list API, for
    the Python paths) plus `.flat` — the same chains as flat arrays
    (chain_off, seed_off, rbeg, qbeg, len) over the WHOLE chunk, the
    zero-object currency of the native align path."""
    flat = None


def _chains_from_flat(flat, n_reads):
    """Materialize per-read Chain-object lists from flat arrays (the
    Python fallback path's input format)."""
    from ..core.chain import Chain
    chain_off, seed_off, s_rbeg, s_qbeg, s_len = flat
    rb_l, qb_l, ln_l = (np.asarray(s_rbeg).tolist(),
                        np.asarray(s_qbeg).tolist(),
                        np.asarray(s_len).tolist())
    c_off_l = np.asarray(chain_off).tolist()
    sd_off_l = np.asarray(seed_off).tolist()
    out = []
    for i in range(n_reads):
        lst = []
        for c in range(c_off_l[i], c_off_l[i + 1]):
            lo, hi = sd_off_l[c], sd_off_l[c + 1]
            seeds_c = list(zip(rb_l[lo:hi], qb_l[lo:hi], ln_l[lo:hi]))
            lst.append(Chain(pos=seeds_c[0][0], seeds=seeds_c))
        out.append(lst)
    return out


# native serial region construction (C++, core/nfinalize.py) — exact
# replay of the chain-filter/containment bookkeeping consuming the
# speculative wave's results; BWAMEM_TPU_NATIVE_REGIONS=0 forces the
# Python generator machinery
NATIVE_REGIONS = _os.environ.get("BWAMEM_TPU_NATIVE_REGIONS", "1") != "0"


class JaxSeedingEngine:
    def __init__(self, fm_host, max_len: int = 128, sa_max_steps: int = 1024,
                 ext_lq: int = 128, ext_lt: int = 544, mesh=None):
        # sa_max_steps: the psi-walk length to a sampled SA row is
        # ~geometric with mean sa_intv (32); the device loop exits at
        # the max LIVE walk (~32*ln(lanes) ~ 300), so a high cap is
        # free while a 128 cap sent ~1.7% of lookups to the scalar
        # host walk (~1s+ of pure Python per bench run)
        self.fm_host = fm_host
        self.dfm = DeviceFmIndex.from_host(fm_host)
        # data-parallel multi-chip: shard every dispatch's lane axis
        # over the reads mesh, index tables replicated per chip
        # (SURVEY.md §2.4); lane widths must divide evenly
        self.kernels = None
        if mesh is not None and mesh.devices.size > 1:
            from ..parallel.mesh import ShardedKernels, READS_AXIS
            n = mesh.devices.size
            from .seeding import LANES, SA_SLICE
            for width in (LANES, SA_SLICE, WAVE, WAVE_EXT, WAVE_GLO):
                if width % n:
                    raise ValueError(
                        f"lane width {width} not divisible by mesh size "
                        f"{n}; adjust BWAMEM_TPU_LANES/WAVE")
            # BWAMEM_TPU_SHARD_TABLES=1: row-shard the occ-block table
            # and the sampled SA across the mesh (HBM capacity mode for
            # references that don't fit per-chip; gathers become ICI
            # collectives — ops/fm.py table_axis)
            shard_tables = _os.environ.get(
                "BWAMEM_TPU_SHARD_TABLES", "0") != "0"
            self.kernels = ShardedKernels(mesh, shard_tables=shard_tables)
            if shard_tables:
                import jax
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel.mesh import pad_to_shards

                def put(a, spec):
                    return jax.device_put(a, NamedSharding(mesh, spec))
                self.dfm.blocks = put(
                    pad_to_shards(np.asarray(self.dfm.blocks), n, 0),
                    PartitionSpec(READS_AXIS, None))
                self.dfm.sa = put(
                    pad_to_shards(np.asarray(self.dfm.sa), n, 0),
                    PartitionSpec(READS_AXIS))
        self.seeder = BatchedSeeder(self.dfm, max_len=max_len,
                                    sa_max_steps=sa_max_steps,
                                    fm_host=fm_host, timer=self,
                                    kernels=self.kernels)
        self.max_len = max_len
        # per-chunk length buckets: chunks whose longest read exceeds
        # max_len seed through a lazily-built L=256 seeder instead of
        # falling to the host path.  The reference's accelerator is
        # hard-capped at ~101 bp (software/bwt.c:575, 7-bit coordinates
        # hardware/afu_core.v:4437-4441); serving modern 150-250 bp
        # reads on the device path is a deliberate improvement on it.
        # Mesh dispatches keep the primary bucket only.
        self._seeders = {self.seeder.L: self.seeder}
        self._sa_max_steps = sa_max_steps
        self.dev_max_len = (max_len if mesh is not None else int(
            _os.environ.get("BWAMEM_TPU_DEV_MAX_LEN", "512")))
        self._ext_lq = ext_lq
        self._ext_lt = ext_lt
        self._glo_lq = ext_lq
        self._glo_lt = ext_lq + 32  # target within band of query length
        # on-chip extension row builder state (ops.pallas_extbuild)
        self._pacp = None
        self._pacp_key = None
        self._l_pac_dev = None
        # device-time accounting: the analog of the reference manager's
        # afu_time counter (software/fastmap.c:322,388,427)
        self.kernel_time = 0.0
        self.n_dispatches = 0
        self.kernel_time_by_tag = {}

    def _seeder_for(self, max_rl: int) -> BatchedSeeder:
        """Smallest seeding-kernel width covering the chunk's longest
        device-eligible read: the primary bucket (L=max_len, the
        classic 101 bp regime), a lazily-built L=256 bucket for
        150-250 bp chunks, or the L=512 long-fragment bucket (HBM DMA
        kernels only; radix-1024 merge key, int32 wire) — the
        reference's accelerator caps at ~101 bp, so everything past
        that is an improvement on it."""
        if max_rl <= self.max_len:
            return self.seeder
        L = 256 if max_rl <= 256 else 512
        s = self._seeders.get(L)
        if s is None:
            s = BatchedSeeder(self.dfm, max_len=L,
                              sa_max_steps=self._sa_max_steps,
                              fm_host=self.fm_host, timer=self,
                              kernels=self.kernels)
            self._seeders[L] = s
        return s

    def _ext_shapes(self, reads):
        """Per-chunk extension-kernel shapes: (LQ, LT_max, lt_buckets).
        Chunks of classic <=128 bp reads keep the tuned 128/544 shapes;
        longer chunks widen the query side to 256, and long-fragment
        (257-512 bp) chunks to 512."""
        max_rl = max((len(r.seq_nt4) for r in reads), default=0)
        if max_rl <= self._ext_lq:
            return self._ext_lq, self._ext_lt, LT_BUCKETS
        if max_rl <= 256:
            return 256, LT_BUCKETS_LONG[-1], LT_BUCKETS_LONG
        return 512, LT_BUCKETS_XL[-1], LT_BUCKETS_XL

    def chain_batch(self, opt, reads, traces=None,
                    trace_seeds=False) -> List[list]:
        """Batched replacement for per-read mem_chain
        (software/bwamem.c:453-501): device seeding + SA, host chain
        insertion replaying the kbtree semantics.  `trace_seeds` adds
        the -v>=5 seed dump (bwamem.c:478-479) in per-read order (the
        reference's batched seeder interleaves reads; we emit the
        equivalent per-read grouping)."""
        from ..core.chain import Chain, ChainTree, _test_and_merge
        from ..core.pipeline import encode_read

        l_pac = None
        for r in reads:
            encode_read(r)

        lens = [len(r.seq_nt4) for r in reads]
        # per-chunk length bucket: smallest seeder width covering the
        # chunk's longest device-eligible read
        chunk_cap = max((ln for ln in lens if ln <= self.dev_max_len),
                        default=0)
        seeder = self._seeder_for(chunk_cap)
        dev_cap = seeder.L
        dev_idx = [i for i, r in enumerate(reads)
                   if lens[i] <= dev_cap
                   and lens[i] >= opt.min_seed_len]
        host_idx = [i for i, r in enumerate(reads)
                    if lens[i] > dev_cap]
        if host_idx:
            self._count("host_routed_reads", len(host_idx))

        chains: List[list] = [[] for _ in reads]
        if dev_idx:
            queries = [reads[i].seq_nt4 for i in dev_idx]
            l_pac = self.fm_host.seq_len >> 1
            streams = None
            if (NATIVE_REGIONS and traces is None
                    and _os.environ.get("BWAMEM_TPU_SUPERSTEP",
                                        "1") != "0"
                    and self._native_ok()):
                # arrays end-to-end: superstep intervals -> vectorized
                # SA-resolved seeds -> native kbtree chaining (one C
                # call for the chunk); falls through to the per-seed
                # Python loop when the library is unavailable
                from ..core.nfinalize import chain_batch_native
                iv = seeder.interval_arrays(opt, queries)
                rid, s_rb, s_qb, s_ln = seeder.seeds_from_arrays(
                    self.fm_host, iv, opt)
                counts = np.bincount(rid, minlength=len(dev_idx)) \
                    if len(rid) else np.zeros(len(dev_idx), np.int64)
                read_off = np.zeros(len(dev_idx) + 1, dtype=np.int64)
                np.cumsum(counts, out=read_off[1:])
                out = chain_batch_native(l_pac, opt.w,
                                         opt.max_chain_gap,
                                         len(dev_idx), read_off,
                                         s_rb, s_qb, s_ln)
                if out is not None:
                    c_off, sd_off, o_rb, o_qb, o_ln = out
                    if not host_idx:
                        # pure-native fast path: no Chain objects at
                        # all — the align path consumes the flat arrays
                        full_counts = np.zeros(len(reads), np.int64)
                        full_counts[np.asarray(dev_idx, np.int64)] = \
                            np.diff(c_off)
                        chain_off_full = np.zeros(len(reads) + 1,
                                                  np.int64)
                        np.cumsum(full_counts, out=chain_off_full[1:])
                        cb = ChainBatch()
                        cb.flat = (chain_off_full, sd_off, o_rb, o_qb,
                                   o_ln)
                        return cb
                    # mixed chunk: chain the host reads (native-oracle
                    # mem_chain) and splice them into the flat arrays
                    # in global read order — dropping to Chain objects
                    # here used to push the WHOLE chunk onto the Python
                    # wave path, whose fixed LQ=128 served every
                    # long-read extension with the scalar host kernel
                    from ..core.chain import mem_chain
                    hch = {i: mem_chain(opt, self.fm_host, l_pac,
                                        reads[i].seq_nt4)
                           for i in host_idx}
                    dev_pos = {i: bi for bi, i in enumerate(dev_idx)}
                    n_chains = np.zeros(len(reads), np.int64)
                    n_chains[np.asarray(dev_idx, np.int64)] = \
                        np.diff(c_off)
                    for i, lst in hch.items():
                        n_chains[i] = len(lst)
                    chain_off_full = np.zeros(len(reads) + 1, np.int64)
                    np.cumsum(n_chains, out=chain_off_full[1:])
                    seed_cnt = []  # per chain, in global order
                    rb_p, qb_p, ln_p = [], [], []
                    sd_cnt_dev = np.diff(sd_off)
                    for i in range(len(reads)):
                        bi = dev_pos.get(i)
                        if bi is not None:
                            c0, c1 = int(c_off[bi]), int(c_off[bi + 1])
                            if c1 > c0:
                                seed_cnt.append(sd_cnt_dev[c0:c1])
                                lo = int(sd_off[c0])
                                hi = int(sd_off[c1])
                                rb_p.append(o_rb[lo:hi])
                                qb_p.append(o_qb[lo:hi])
                                ln_p.append(o_ln[lo:hi])
                        else:
                            for c in hch.get(i, ()):
                                seed_cnt.append(
                                    np.asarray([c.n], np.int64))
                                rb_p.append(np.asarray(
                                    [s[0] for s in c.seeds], o_rb.dtype))
                                qb_p.append(np.asarray(
                                    [s[1] for s in c.seeds], o_qb.dtype))
                                ln_p.append(np.asarray(
                                    [s[2] for s in c.seeds], o_ln.dtype))
                    sd_off_full = np.zeros(
                        int(chain_off_full[-1]) + 1, np.int64)
                    if seed_cnt:
                        np.cumsum(np.concatenate(seed_cnt),
                                  out=sd_off_full[1:])
                    cb = ChainBatch()
                    cb.flat = (
                        chain_off_full, sd_off_full,
                        np.concatenate(rb_p) if rb_p
                        else o_rb[:0],
                        np.concatenate(qb_p) if qb_p
                        else o_qb[:0],
                        np.concatenate(ln_p) if ln_p
                        else o_ln[:0])
                    return cb
            if dev_idx:
                if streams is None:
                    # x1 is never consumed on the mem path — skip its
                    # download
                    streams = seeder.interval_streams(
                        opt, queries, need_x1=False)
                seeds = seeder.seed_positions(self.fm_host,
                                              streams, opt)
            for bi, i in enumerate(dev_idx):
                tree = ChainTree()
                for s in seeds[bi]:
                    rbeg, qbeg, slen = s
                    if trace_seeds and traces is not None:
                        traces[i].append(
                            "* Found SEED: length=%d,query_beg=%d,"
                            "ref_beg=%d\n" % (slen, qbeg, rbeg))
                    if rbeg < l_pac < rbeg + slen:
                        continue  # bridging fwd-rev boundary
                    to_add = False
                    if len(tree):
                        low = tree.lower(rbeg)
                        if low is None or not _test_and_merge(
                                opt, l_pac, low, s):
                            to_add = True
                    else:
                        to_add = True
                    if to_add:
                        tree.insert(Chain(pos=rbeg, seeds=[s]))
                chains[i] = tree.chains
        if host_idx:
            from ..core.chain import mem_chain
            l_pac = self.fm_host.seq_len >> 1
            for i in host_idx:
                chains[i] = mem_chain(
                    opt, self.fm_host, l_pac, reads[i].seq_nt4,
                    traces[i] if (trace_seeds and traces is not None)
                    else None)
        return chains

    def align_batch(self, opt, fm, bns, pac, reads, traces=None,
                    trace_seeds=False, chains=None) -> List[list]:
        """mem_align1_core for a whole batch: batched device seeding,
        then all reads' chain extensions advanced in lock-step waves —
        every wave is ONE batched ksw_extend2 device dispatch over the
        live (read, seed, side) lanes (the reference's batch-dispatch
        structure applied to the SW stage).  `traces` (one TraceLog per
        read) collects the -v>=4 lines.  `chains` may be precomputed
        (the chunk-pipelined driver seeds chunk k+1 on a helper thread
        while chunk k's waves run, core.pipeline.process_chunk_stream).

        Extension results depend only on the seed and its chain window
        — never on the serial containment bookkeeping that decides
        WHICH seeds extend — so every seed's fused extension is
        dispatched SPECULATIVELY up front as one pipelined wave set,
        and the exact per-read serial logic then consumes the cached
        results: byte-identical output, without one dispatch round
        trip per serial extension step."""
        from ..core.pipeline import align1_core_gen
        cache = prefetched = None
        if isinstance(chains, tuple):      # prefetch_batch output
            chains, cache = chains
            prefetched = True
        if chains is None:
            chains = self.chain_batch(opt, reads, traces=traces,
                                      trace_seeds=trace_seeds)
        if (isinstance(chains, ChainBatch) and chains.flat is not None
                and traces is None and SPECULATE):
            # fully-native path: pack + device extension waves +
            # region construction all on flat arrays (zero per-seed
            # Python); falls through on any unavailability.  `cache`
            # may carry the prefetched (pk, pend) from the pipeline's
            # helper thread.
            packed = (cache[1] if isinstance(cache, tuple)
                      and len(cache) == 2 and cache[0] == "native_pend"
                      else None)
            regs = self._align_batch_native(opt, bns, pac, reads,
                                            chains.flat, packed=packed)
            if regs is not None:
                return regs
        if isinstance(chains, ChainBatch):
            chains = _chains_from_flat(chains.flat, len(reads))
        if isinstance(cache, tuple):  # native prefetch sentinel: not a
            cache = None              # content-keyed dict; drop it
        if (cache is None and not prefetched and SPECULATE
                and traces is None):
            cache = self._speculate_extensions(opt, bns, pac, reads,
                                               chains)
        if (NATIVE_REGIONS and traces is None and cache is not None
                and getattr(cache, "outs", None) is not None):
            from ..core.nfinalize import regions_batch_native
            regs = regions_batch_native(opt, bns.l_pac, pac, reads,
                                        chains, cache.outs)
            if regs is not None:
                return regs
        gens = [align1_core_gen(
                    opt, fm, bns, pac, r, chains=chains[i],
                    trace=traces[i] if traces is not None else None)
                for i, r in enumerate(reads)]
        return self.drive_waves(opt, gens, cache=cache)

    def _pack_and_dispatch(self, opt, bns, pac, reads, flat):
        """First half of the native align path: C++ pack (+ scalar
        oversize fallback) and the grouped device extend_lr dispatches.
        Returns (pk, pend) or None; safe to run on the pipeline's
        helper thread (the pack releases the GIL inside C++)."""
        import jax.numpy as jnp
        from ..core.nfinalize import pack_extlr_native
        from .ksw import ksw_extend_lr_batched
        n_seeds = len(flat[2])
        if n_seeds > 16 * max(len(reads), 1):
            return None  # seed-rich chunk: speculation would waste the
            #              device (same budget as the Python path)
        LQ, LT_max, lt_buckets = self._ext_shapes(reads)
        pk = pack_extlr_native(opt, bns.l_pac, pac, reads, flat, LQ,
                               LT_max)
        if pk is None:
            return None
        # device waves over the in-cap lanes, size-sorted and LT-bucketed
        dev = np.nonzero(pk["served"] == 0)[0]
        order = dev[np.argsort(pk["lt_need"][dev], kind="stable")]
        fn = (self.kernels.extend_lr if self.kernels is not None
              else ksw_extend_lr_batched)
        mat = self._mat_i32(opt)

        # on-device row construction (ops.pallas_extbuild): the wave
        # uploads ~40 B of scalars per seed instead of ~700 B of packed
        # sequence rows — the dominant wave cost over the host link
        onchip = None
        if self.kernels is None:
            from .pallas_extbuild import (onchip_ext_available,
                                          onchip_shapes_ok)
            max_rl = max((len(r.seq_nt4) for r in reads), default=0)
            if (onchip_ext_available(len(reads), bns.l_pac)
                    and max_rl <= LQ and WAVE_EXT % 128 == 0
                    and all(onchip_shapes_ok(LQ, b) for b in lt_buckets)):
                onchip = self._onchip_ext_args(bns, pac, reads, flat, LQ)

        pend = []
        for lo in range(0, len(order), WAVE_EXT):
            grp = order[lo:lo + WAVE_EXT]
            g = len(grp)
            B = WAVE_EXT
            gmax = int(pk["lt_need"][grp].max()) if g else 0
            LT = next(b for b in lt_buckets if b >= gmax)

            def rows(key, width):
                buf = np.full((B, width >> 1), 0x44, np.int8)
                buf[:g] = pk[key][grp][:, :width >> 1]
                return jnp.asarray(buf)

            def scal(key, dt, fill=0):
                a = np.full(B, fill, dt)
                a[:g] = pk[key][grp]
                return jnp.asarray(a)

            if onchip is not None:
                from .pallas_extbuild import extend_lr_onchip
                qmat8, pacp, l_pac_dev, rid_all = onchip

                def pads(a, fill=0, dt=np.int32):
                    out = np.full(B, fill, dt)
                    out[:g] = a[grp]
                    return jnp.asarray(out)

                dev_out = extend_lr_onchip(
                    qmat8, pacp, l_pac_dev,
                    pads(rid_all), scal("sqb", np.int32),
                    scal("slv", np.int32),
                    pads(pk["srb"].astype(np.int32)),
                    pads(pk["rmax0"].astype(np.int32)),
                    pads((pk["srb"] + pk["slv"]
                          + pk["rlt"]).astype(np.int32)),
                    scal("lqv", np.int32, fill=1),
                    scal("llq", np.int32), scal("llt", np.int32),
                    scal("rlq", np.int32), scal("rlt", np.int32),
                    scal("scs", np.int32), scal("srb", np.int64),
                    scal("rmax0", np.int64), mat,
                    opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                    opt.w, opt.pen_clip5, opt.pen_clip3, opt.zdrop,
                    LQ=LQ, LT=LT)
            else:
                dev_out = fn(
                    rows("lq_pk", LQ), rows("lt_pk", LT),
                    scal("llq", np.int32), scal("llt", np.int32),
                    rows("rq_pk", LQ), rows("rt_pk", LT),
                    scal("rlq", np.int32), scal("rlt", np.int32),
                    mat, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                    opt.w, opt.pen_clip5, opt.pen_clip3, opt.zdrop,
                    scal("scs", np.int32), scal("sqb", np.int32),
                    scal("srb", np.int64), scal("rmax0", np.int64),
                    scal("lqv", np.int32, fill=1), scal("slv", np.int32),
                    LQ=LQ, LT=LT, packed=True)
            pend.append((grp, dev_out))
        return pk, pend

    def _onchip_ext_args(self, bns, pac, reads, flat, LQ):
        """Device-resident inputs for the on-chip extension row builder:
        the chunk's reads matrix (padded to a coarse lane grid so chunk
        size variations don't multiply compiles), the pac byte planes
        (once per index), and per-seed read ids."""
        import jax
        import jax.numpy as jnp
        # key holds the pac array itself (not id(pac)): the reference
        # pins the object, so identity cannot be recycled
        key = (pac, int(bns.l_pac))
        if self._pacp is None or self._pacp_key is None \
                or self._pacp_key[0] is not pac \
                or self._pacp_key[1] != key[1]:
            from .pallas_extbuild import prep_pac_planes
            self._pacp = jax.device_put(jnp.asarray(
                prep_pac_planes(pac), jnp.bfloat16))
            self._l_pac_dev = jnp.asarray(np.int32(bns.l_pac))
            self._pacp_key = key
        nrp = max(2048, -(-len(reads) // 2048) * 2048)
        qmat = np.full((LQ, nrp), 4, np.int8)
        for i, r in enumerate(reads):
            qmat[:len(r.seq_nt4), i] = r.seq_nt4
        qmat8 = jnp.asarray(qmat)
        from ..core.nfinalize import seed_read_ids
        rid_all = seed_read_ids(flat, len(reads))
        return qmat8, self._pacp, self._l_pac_dev, rid_all

    def _collect_and_regions(self, opt, bns, pac, reads, flat, pk, pend):
        """Second half: collect the extension waves and build regions
        natively.  Returns per-read AlnReg lists or None."""
        import jax
        from ..core.nfinalize import regions_batch_native_flat
        e_sc, e_ts = pk["r_score"], pk["r_truesc"]
        e_qb, e_rb = pk["r_qb"], pk["r_rb"]
        e_qe, e_re = pk["r_qe"], pk["r_re"]
        e_a0, e_a1 = pk["r_aw0"], pk["r_aw1"]
        for grp, dev_out in pend:
            res = self._timed(lambda d=dev_out: jax.device_get(d),
                              _tag="extend_lr")
            g = len(grp)
            (e_sc[grp], e_ts[grp], e_qb[grp], e_rb[grp], e_qe[grp],
             e_re[grp], e_a0[grp], e_a1[grp]) = (
                np.asarray(res[0])[:g], np.asarray(res[1])[:g],
                np.asarray(res[2])[:g], np.asarray(res[3])[:g],
                np.asarray(res[4])[:g], np.asarray(res[5])[:g],
                np.asarray(res[6])[:g], np.asarray(res[7])[:g])
        if _os.environ.get("BWAMEM_TPU_VERIFY"):
            # the reference's USE_SW_VERIFY role (SURVEY.md §4.3): run
            # the software twin of the whole wave and compare
            from ..core.nfinalize import pack_extlr_native
            ref = pack_extlr_native(opt, bns.l_pac, pac, reads, flat,
                                    self._ext_lq, self._ext_lt,
                                    force_scalar=True)
            n_bad = 0
            for key, dev_arr in (("r_score", e_sc), ("r_truesc", e_ts),
                                 ("r_qb", e_qb), ("r_rb", e_rb),
                                 ("r_qe", e_qe), ("r_re", e_re),
                                 ("r_aw0", e_a0), ("r_aw1", e_a1)):
                n_bad += int((dev_arr != ref[key]).sum())
            import sys as _sys
            if n_bad:
                _sys.stderr.write(
                    "[E::verify] device/software extension mismatch in "
                    "%d fields over %d seeds\n" % (n_bad, len(e_sc)))
            else:
                _sys.stderr.write(
                    "[M::verify] extension wave verified: %d seeds "
                    "device==software\n" % len(e_sc))
        return regions_batch_native_flat(
            opt, bns.l_pac, pac, reads, flat,
            (e_sc, e_ts, e_qb, e_rb, e_qe, e_re, e_a0, e_a1),
            as_flat=True)

    def _align_batch_native(self, opt, bns, pac, reads, flat,
                            packed=None):
        """Flat-array align path: native pack (+ scalar oversize
        fallback), grouped device extend_lr waves, native region
        construction.  Returns per-read AlnReg lists, or None when the
        native library is unavailable / speculation is over budget.
        `packed` may carry a prefetched (pk, pend) pair."""
        if packed is None:
            packed = self._pack_and_dispatch(opt, bns, pac, reads, flat)
        if packed is None:
            return None
        pk, pend = packed
        return self._collect_and_regions(opt, bns, pac, reads, flat, pk,
                                         pend)

    def prefetch_batch(self, opt, bns, pac, reads):
        """The pipelined stage for chunk k+1: seeding + chaining AND the
        speculative extension wave set, so every device round trip of
        the next chunk overlaps the current chunk's host finalize.
        Returns (chains, cache) — align_batch unpacks it."""
        chains = self.chain_batch(opt, reads)
        cache = None
        if isinstance(chains, ChainBatch):
            if SPECULATE and chains.flat is not None:
                # pack + dispatch ahead: the C++ pack releases the GIL,
                # and the device extension waves upload while the main
                # thread finalizes the previous chunk
                packed = self._pack_and_dispatch(opt, bns, pac, reads,
                                                 chains.flat)
                if packed is not None:
                    cache = ("native_pend", packed)
        elif SPECULATE:
            cache = self._speculate_extensions(opt, bns, pac, reads,
                                               chains)
        return (chains, cache)

    def warm_shapes(self, opt):
        """Pre-compile every fixed dispatch shape (all extension LT
        buckets, the extend2/global shapes) with empty lanes so no
        compile lands inside a measured/served request."""
        import jax
        import jax.numpy as jnp
        from .ksw import ksw_extend_lr_batched, ksw_extend2_batched, \
            ksw_global2_batched
        if self.kernels is not None:
            ksw_extend_lr_batched = self.kernels.extend_lr
            ksw_extend2_batched = self.kernels.extend2
            ksw_global2_batched = self.kernels.global2
        LQ = self._ext_lq
        pend = []
        for LT in LT_BUCKETS:
            B = WAVE_EXT
            z8 = jnp.full((B, LQ // 2), 0x44, jnp.int8)
            t8 = jnp.full((B, LT // 2), 0x44, jnp.int8)
            zi = jnp.zeros(B, jnp.int32)
            z6 = jnp.zeros(B, jnp.int64)
            pend.append(ksw_extend_lr_batched(
                z8, t8, zi, zi, z8, t8, zi, zi, self._mat_i32(opt),
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                opt.w, opt.pen_clip5, opt.pen_clip3, opt.zdrop,
                zi, zi, z6, z6, zi + 1, zi, LQ=LQ, LT=LT, packed=True))
        B = WAVE
        z8 = jnp.full((B, LQ // 2), 0x44, jnp.int8)
        t8 = jnp.full((B, self._ext_lt // 2), 0x44, jnp.int8)
        zi = jnp.zeros(B, jnp.int32)
        pend.append(ksw_extend2_batched(
            z8, t8, zi, zi, self._mat_i32(opt), opt.o_del, opt.e_del,
            opt.o_ins, opt.e_ins, zi + 1, zi, opt.zdrop, zi,
            LQ=LQ, LT=self._ext_lt, packed=True))
        B = WAVE_GLO
        z8 = jnp.full((B, self._glo_lq // 2), 0x44, jnp.int8)
        t8 = jnp.full((B, self._glo_lt // 2), 0x44, jnp.int8)
        zi = jnp.zeros(B, jnp.int32)
        pend.append(ksw_global2_batched(
            z8, t8, zi + 1, zi, self._mat_i32(opt), opt.o_del,
            opt.e_del, opt.o_ins, opt.e_ins, zi + 1,
            LQ=self._glo_lq, LT=self._glo_lt, packed=True))
        jax.block_until_ready(pend)

    @staticmethod
    def _lr_key(req):
        (_, qs, rs, qrt, rrt, sc_seed, s_qbeg, s_rbeg, rmax0,
         l_query, s_len) = req
        # rs/rrt are pure functions of (pac, rmax0, s_rbeg, lengths):
        # pac is a run constant, len(rs) == s_rbeg-rmax0, and rmax1
        # enters only through len(rrt) — so keying the query-side bytes
        # plus the scalars is exact at a fraction of the hashing cost
        return (qs.tobytes(), qrt.tobytes(), len(rrt),
                sc_seed, s_qbeg, s_rbeg, rmax0, l_query, s_len)

    def _speculate_extensions(self, opt, bns, pac, reads, chains):
        """One batched wave set covering EVERY seed's fused extension
        (a superset of what the serial path will request); returns a
        content-keyed result cache whose `.outs` holds the results
        positionally (one per flattened (read, chain, seed) — the
        native region builder consumes them by index).  Chains so
        seed-rich that speculation would waste the device fall back to
        live waves."""
        from ..core.region import chain_rmax_rseq, seed_lr_request
        reqs = []
        budget = 16 * max(len(reads), 1)
        for i, r in enumerate(reads):
            for c in chains[i]:
                if c.n == 0:
                    continue
                rmax0, _, rseq = chain_rmax_rseq(
                    opt, bns.l_pac, pac, r.seq_nt4, c)
                for seed in c.seeds:
                    reqs.append(seed_lr_request(
                        opt, r.seq_nt4, rmax0, rseq, seed))
            if len(reqs) > budget:
                return None
        if not reqs:
            cache = ExtCache()
            cache.outs = []
            return cache
        outs = self._extend_lr_wave(opt, reqs)
        cache = ExtCache((self._lr_key(q), o)
                         for q, o in zip(reqs, outs))
        cache.outs = outs
        return cache

    def drive_waves(self, opt, gens, cache=None) -> List:
        """Advance all generators in lock-step; every wave serves the
        live requests grouped by type, one batched device dispatch per
        type (the reference's batch-dispatch structure applied to every
        SW call site).  `cache` (content-keyed speculative extension
        results) answers extend_lr requests without a dispatch.
        Returns each generator's return value."""
        results: List = [None] * len(gens)
        live = {}

        def advance(i, out):
            while True:
                try:
                    req = gens[i].send(out)
                except StopIteration as e:
                    results[i] = e.value
                    return
                if cache is not None and req[0] == "extend_lr":
                    hit = cache.get(self._lr_key(req))
                    if hit is not None:
                        out = hit
                        continue
                live[i] = req
                return

        for i in range(len(gens)):
            advance(i, None)
        while live:
            order = list(live.keys())
            reqs = [live[i] for i in order]
            outs = [None] * len(reqs)
            if len(reqs) < MIN_WAVE:  # tail: host oracle is cheaper
                from ..core.swdrive import serve_host
                for j, r in enumerate(reqs):
                    outs[j] = serve_host(r, opt)
                live = {}
                for i, out in zip(order, outs):
                    advance(i, out)
                continue
            ext = [j for j, r in enumerate(reqs) if r[0] == "extend2"]
            elr = [j for j, r in enumerate(reqs) if r[0] == "extend_lr"]
            glo = [j for j, r in enumerate(reqs) if r[0] == "global2"]
            al2 = [j for j, r in enumerate(reqs) if r[0] == "align2"]
            oth = [j for j, r in enumerate(reqs)
                   if r[0] not in ("extend2", "extend_lr", "global2",
                                   "align2")]
            if ext:
                for j, out in zip(ext, self._extend_wave(
                        opt, [reqs[j] for j in ext])):
                    outs[j] = out
            if elr:
                for j, out in zip(elr, self._extend_lr_wave(
                        opt, [reqs[j] for j in elr])):
                    outs[j] = out
            if glo:
                for j, out in zip(glo, self._global_wave(
                        opt, [reqs[j] for j in glo])):
                    outs[j] = out
            if al2:
                from .ksw_align import align2_wave
                for j, out in zip(al2, align2_wave(
                        opt, [reqs[j] for j in al2], WAVE,
                        timed=self._timed)):
                    outs[j] = out
            for j in oth:
                from ..core.swdrive import serve_host
                outs[j] = serve_host(reqs[j], opt)
            live = {}
            for i, out in zip(order, outs):
                advance(i, out)
        return results

    def _native_ok(self) -> bool:
        if not hasattr(self, "_native_lib_ok"):
            try:
                from ..core.nfinalize import available
                self._native_lib_ok = available()
            except Exception:
                self._native_lib_ok = False
        return self._native_lib_ok

    def _timed(self, fn, *args, _tag="other", **kw):
        import time
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        dt = time.perf_counter() - t0
        self.kernel_time += dt
        self.n_dispatches += 1
        kt = self.kernel_time_by_tag
        kt[_tag] = kt.get(_tag, 0.0) + dt
        kt["n_" + _tag] = kt.get("n_" + _tag, 0) + 1
        return out

    def _count(self, tag: str, n: int = 1) -> None:
        """Fallback/overflow accounting (per-cap host-fallback rates:
        SMEM buffer, SA walk, key expansion, length routing) — rides
        the same stats dict the bench's stage report prints."""
        kt = self.kernel_time_by_tag
        kt[tag] = kt.get(tag, 0) + n

    def _extend_wave(self, opt, reqs):
        """One batched ksw_extend2 dispatch over a wave of requests
        ("extend2", qs, rs, w, end_bonus, h0).  Oversized lanes fall
        back to the host oracle (the reference's HW-cap/CPU-fallback
        split, software/bwt.c:603-717)."""
        import jax.numpy as jnp
        from .ksw import ksw_extend2_batched
        from ..core.swdrive import serve_host

        LQ, LT = self._ext_lq, self._ext_lt
        n = len(reqs)
        dev_idx = [i for i, r in enumerate(reqs)
                   if len(r[1]) <= LQ and len(r[2]) <= LT]
        outs = [None] * n
        for i in set(range(n)) - set(dev_idx):
            outs[i] = serve_host(reqs[i], opt)
        import jax
        # dispatch every group before collecting any: jax dispatch is
        # async, so group k+1's upload/compute overlaps group k's result
        # round trip (this matters over the remote-device tunnel)
        pend = []
        for lo in range(0, len(dev_idx), WAVE):
            grp = dev_idx[lo:lo + WAVE]
            B = WAVE
            qb = np.full((B, LQ), 4, np.int8)
            tb = np.full((B, LT), 4, np.int8)
            qlen = np.zeros(B, np.int32)
            tlen = np.zeros(B, np.int32)
            wv = np.ones(B, np.int32)
            ebv = np.zeros(B, np.int32)
            h0v = np.zeros(B, np.int32)
            for bi, i in enumerate(grp):
                _, qs, rs, w, pen, h0 = reqs[i]
                qb[bi, :len(qs)] = qs
                tb[bi, :len(rs)] = rs
                qlen[bi], tlen[bi] = len(qs), len(rs)
                wv[bi], ebv[bi], h0v[bi] = w, pen, h0
            fn = (self.kernels.extend2 if self.kernels is not None
                  else ksw_extend2_batched)
            dev = fn(
                jnp.asarray(_pack4(qb)), jnp.asarray(_pack4(tb)),
                jnp.asarray(qlen),
                jnp.asarray(tlen), self._mat_i32(opt),
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                jnp.asarray(wv), jnp.asarray(ebv), opt.zdrop,
                jnp.asarray(h0v), LQ=LQ, LT=LT, packed=True)
            pend.append((grp, dev))
        for grp, dev in pend:
            res = self._timed(lambda dev=dev: jax.device_get(dev),
                              _tag="extend2")
            cols = [r.tolist() for r in res]
            for bi, i in enumerate(grp):
                outs[i] = tuple(c[bi] for c in cols)
        return outs

    def _extend_lr_wave(self, opt, reqs):
        """One batched fused left+right extension dispatch per group of
        ("extend_lr", qs, rs, qrt, rrt, sc_seed, s_qbeg, s_rbeg, rmax0,
        l_query, s_len) requests (see core.swdrive.extend_seed_lr)."""
        import jax
        import jax.numpy as jnp
        from .ksw import ksw_extend_lr_batched
        from ..core.swdrive import serve_host

        LQ, LT = self._ext_lq, self._ext_lt
        n = len(reqs)
        dev_idx = [i for i, r in enumerate(reqs)
                   if len(r[1]) <= LQ and len(r[2]) <= LT
                   and len(r[3]) <= LQ and len(r[4]) <= LT]
        outs = [None] * n
        for i in set(range(n)) - set(dev_idx):
            outs[i] = serve_host(reqs[i], opt)
        # group lanes by extension size: the kernel's loops run to the
        # max live target length in the group, so packing short lanes
        # together lets their groups exit after a few iterations
        dev_idx.sort(key=lambda i: max(len(reqs[i][2]), len(reqs[i][4])))
        pend = []  # dispatch-all-then-collect
        for lo in range(0, len(dev_idx), WAVE_EXT):
            grp = dev_idx[lo:lo + WAVE_EXT]
            B = WAVE_EXT
            # target-length bucket per group: lanes are size-sorted, so
            # most groups compile (cheap, Pallas) and SHIP at a fraction
            # of the 544-column worst case — the wave is upload-bound
            # over the ~35ms-RTT link
            gmax = max(max(len(reqs[i][2]), len(reqs[i][4]))
                       for i in grp)
            LT = next(b for b in LT_BUCKETS if b >= gmax)
            lqb = np.full((B, LQ), 4, np.int8)
            ltb = np.full((B, LT), 4, np.int8)
            rqb = np.full((B, LQ), 4, np.int8)
            rtb = np.full((B, LT), 4, np.int8)
            llq = np.zeros(B, np.int32)
            llt = np.zeros(B, np.int32)
            rlq = np.zeros(B, np.int32)
            rlt = np.zeros(B, np.int32)
            scs = np.zeros(B, np.int32)
            sqb = np.zeros(B, np.int32)
            srb = np.zeros(B, np.int64)
            rm0 = np.zeros(B, np.int64)
            lqv = np.ones(B, np.int32)
            slv = np.zeros(B, np.int32)
            for bi, i in enumerate(grp):
                (_, qs, rs, qrt, rrt, sc_seed, s_qbeg, s_rbeg, rmax0,
                 l_query, s_len) = reqs[i]
                lqb[bi, :len(qs)] = qs
                ltb[bi, :len(rs)] = rs
                rqb[bi, :len(qrt)] = qrt
                rtb[bi, :len(rrt)] = rrt
                llq[bi], llt[bi] = len(qs), len(rs)
                rlq[bi], rlt[bi] = len(qrt), len(rrt)
                scs[bi], sqb[bi], srb[bi] = sc_seed, s_qbeg, s_rbeg
                rm0[bi], lqv[bi], slv[bi] = rmax0, l_query, s_len
            fn = (self.kernels.extend_lr if self.kernels is not None
                  else ksw_extend_lr_batched)
            dev = fn(
                jnp.asarray(_pack4(lqb)), jnp.asarray(_pack4(ltb)),
                jnp.asarray(llq), jnp.asarray(llt),
                jnp.asarray(_pack4(rqb)), jnp.asarray(_pack4(rtb)),
                jnp.asarray(rlq), jnp.asarray(rlt),
                self._mat_i32(opt),
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                opt.w, opt.pen_clip5, opt.pen_clip3, opt.zdrop,
                jnp.asarray(scs), jnp.asarray(sqb), jnp.asarray(srb),
                jnp.asarray(rm0), jnp.asarray(lqv), jnp.asarray(slv),
                LQ=LQ, LT=LT, packed=True)
            pend.append((grp, dev))
        for grp, dev in pend:
            res = self._timed(lambda dev=dev: jax.device_get(dev),
                              _tag="extend_lr")
            cols = [r.tolist() for r in res]
            for bi, i in enumerate(grp):
                outs[i] = tuple(c[bi] for c in cols)
        return outs

    def _global_wave(self, opt, reqs):
        """One batched ksw_global2 dispatch (with on-device traceback)
        over a wave of ("global2", qs, rs, w) requests."""
        import jax.numpy as jnp
        from .ksw import ksw_global2_batched, cigars_from_tracebacks
        from ..core.swdrive import serve_host

        LQ, LT = self._glo_lq, self._glo_lt
        n = len(reqs)
        dev_idx = [i for i, r in enumerate(reqs)
                   if 0 < len(r[1]) <= LQ and 0 < len(r[2]) <= LT]
        outs = [None] * n
        for i in set(range(n)) - set(dev_idx):
            outs[i] = serve_host(reqs[i], opt)
        import jax
        pend = []  # dispatch-all-then-collect (see _extend_wave)
        for lo in range(0, len(dev_idx), WAVE_GLO):
            grp = dev_idx[lo:lo + WAVE_GLO]
            B = WAVE_GLO
            qb = np.full((B, LQ), 4, np.int8)
            tb = np.full((B, LT), 4, np.int8)
            qlen = np.zeros(B, np.int32)
            tlen = np.zeros(B, np.int32)
            wv = np.ones(B, np.int32)
            for bi, i in enumerate(grp):
                _, qs, rs, w = reqs[i]
                qb[bi, :len(qs)] = qs
                tb[bi, :len(rs)] = rs
                qlen[bi], tlen[bi] = len(qs), len(rs)
                wv[bi] = w
            fn = (self.kernels.global2 if self.kernels is not None
                  else ksw_global2_batched)
            dev = fn(
                jnp.asarray(_pack4(qb)), jnp.asarray(_pack4(tb)),
                jnp.asarray(qlen),
                jnp.asarray(tlen), self._mat_i32(opt),
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                jnp.asarray(wv), LQ=LQ, LT=LT, packed=True)
            pend.append((grp, dev))
        for grp, dev in pend:
            score, ops, n_ops, ri, rk = self._timed(
                lambda dev=dev: jax.device_get(dev), _tag="global2")
            cigars = cigars_from_tracebacks(ops, n_ops, ri, rk,
                                            range(len(grp)))
            for bi, i in enumerate(grp):
                outs[i] = (int(score[bi]), cigars[bi])
        return outs

    def _mat_i32(self, opt):
        key = tuple(opt.mat)
        if getattr(self, "_mat_key", None) != key:
            import jax.numpy as jnp
            self._mat_key = key
            self._mat_dev = jnp.asarray(np.asarray(opt.mat, np.int32))
        return self._mat_dev
