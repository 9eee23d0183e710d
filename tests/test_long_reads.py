"""150-250 bp reads on the device seeding path (the L=256 lane
bucket).  The reference's accelerator is hard-capped at ~101 bp
(101-byte query buffers software/bwt.c:575, 7-bit coordinates
hardware/afu_core.v:4437-4441) and long reads fall back to its CPU
path; we serve them on-device instead.  The one wire subtlety: qb/qe
ride a uint8 wire, and the single overflowing value qe==256 wires as 0
(a real interval always has qe >= 1) — these tests pin full-length
256 bp SMEMs end to end."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_fm():
    from bwamem_tpu.index.fmindex import FmIndex
    rng = np.random.default_rng(23)
    fwd = rng.integers(0, 4, 6000).astype(np.uint8)
    return fwd, FmIndex.build(np.concatenate([fwd, 3 - fwd[::-1]]))


def _long_queries(fwd, rng, n=48):
    """150-256 bp reads incl. exact full-length 256 bp matches (the
    qe==256 wire case), boundary lengths 129/255/256, mismatches and
    ambiguous bases."""
    qs = []
    for i in range(n):
        if i < 6:
            ln = 256          # exact full-length match: qe == 256
        elif i < 10:
            ln = [129, 130, 255, 256][i - 6]
        else:
            ln = int(rng.integers(150, 257))
        off = int(rng.integers(0, len(fwd) - ln))
        q = fwd[off:off + ln].copy()
        if i >= 6 and rng.random() < 0.6:
            for _ in range(int(rng.integers(1, 5))):
                q[int(rng.integers(0, ln))] = int(rng.integers(0, 5))
        qs.append(q)
    return qs


def test_streams_256_match_host_iterator(small_fm):
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.ops.seeding import BatchedSeeder
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.oracle.smem import SmemIterator
    fwd, fm = small_fm
    opt = MemOptions()
    d = DeviceFmIndex.from_host(fm)
    rng = np.random.default_rng(31)
    queries = _long_queries(fwd, rng)
    seeder = BatchedSeeder(d, max_len=256, fm_host=fm)
    streams = seeder.interval_streams(opt, queries)
    n_full = 0
    for q, got in zip(queries, streams):
        itr = SmemIterator(fm, q)
        split_len = min(int(opt.min_seed_len * opt.split_factor + .499),
                        len(q))
        want = []
        while True:
            a = itr.next(split_len, opt.split_width, 1)
            if a is None:
                break
            want.extend(a)
        assert got == want
        n_full += sum(1 for p in got if (p[3] & 0xFFFFFFFF) == 256)
    assert n_full >= 6, "expected full-length qe==256 intervals"


def test_fused_seeds_256_match_split_and_host(small_fm, monkeypatch):
    """At L=256 the fused superstep+SA path, the split path, and the
    list-form seed_positions must all agree."""
    import bwamem_tpu.ops.seeding as sd
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.config import MemOptions
    fwd, fm = small_fm
    d = DeviceFmIndex.from_host(fm)
    opt = MemOptions()
    rng = np.random.default_rng(37)
    queries = _long_queries(fwd, rng, n=40)

    def run(fuse):
        monkeypatch.setattr(sd, "FUSE_SA", fuse)
        s = sd.BatchedSeeder(d, max_len=256, sa_max_steps=1024,
                             fm_host=fm)
        iv = s.interval_arrays(opt, queries)
        seeds = s.seeds_from_arrays(fm, iv, opt)
        return s, iv, seeds

    _, iv_a, seeds_a = run(False)
    s_b, iv_b, seeds_b = run(True)
    for x, y in zip(iv_a, iv_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for name, x, y in zip(["rid", "rbeg", "qb", "len"], seeds_a,
                          seeds_b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=f"fused-SA seeds field {name} diverged at L=256")
    # cross-check against the list-form path
    streams = s_b.interval_streams(opt, queries, need_x1=False)
    want = s_b.seed_positions(fm, streams, opt)
    rid, rbeg, qbeg, slen = seeds_b
    got = [[] for _ in queries]
    for k in range(len(rid)):
        got[int(rid[k])].append((int(rbeg[k]), int(qbeg[k]),
                                 int(slen[k])))
    assert got == [list(map(tuple, w)) for w in want]


def test_engine_bucket_routing_long(small_fm):
    """A mixed 101/250 bp chunk must route through the L=256 bucket and
    produce exactly the host mem_chain chains for every read."""
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.core.chain import mem_chain
    from bwamem_tpu.io.fastq import Read
    from bwamem_tpu.ops.engine import (JaxSeedingEngine, ChainBatch,
                                       _chains_from_flat)
    fwd, fm = small_fm
    opt = MemOptions()
    rng = np.random.default_rng(41)
    bases = "ACGT"
    reads = []
    for i, q in enumerate(_long_queries(fwd, rng, n=24)):
        if i % 3 == 0:
            q = q[:101]  # mixed-length chunk
        if i % 11 == 1:  # oversize: host-chained, spliced into flat
            off = int(rng.integers(0, len(fwd) - 280))
            q = fwd[off:off + 280]
        reads.append(Read(name=f"r{i}",
                          seq="".join(bases[b] if b < 4 else "N"
                                      for b in q),
                          qual="I" * len(q), comment=None))
    assert any(len(r.seq) > 256 for r in reads)
    eng = JaxSeedingEngine(fm)
    assert eng.dev_max_len >= 256
    chains = eng.chain_batch(opt, reads)
    if isinstance(chains, ChainBatch) and chains.flat is not None:
        chains = _chains_from_flat(chains.flat, len(reads))
    l_pac = fm.seq_len >> 1
    for r, got in zip(reads, chains):
        want = mem_chain(opt, fm, l_pac, r.seq_nt4)
        assert [(c.pos, list(map(tuple, c.seeds))) for c in got] == \
            [(c.pos, list(map(tuple, c.seeds))) for c in want], r.name


def test_engine_bucket_routing_512(small_fm):
    """257-512 bp reads route through the L=512 long-fragment bucket
    (radix-1024 merge key, int32 wire) and must produce exactly the
    host mem_chain chains; >512 bp reads still host-chain and splice."""
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.core.chain import mem_chain
    from bwamem_tpu.io.fastq import Read
    from bwamem_tpu.ops.engine import (JaxSeedingEngine, ChainBatch,
                                       _chains_from_flat)
    fwd, fm = small_fm
    opt = MemOptions()
    rng = np.random.default_rng(61)
    bases = "ACGT"
    reads = []
    lens = [300, 400, 512, 511, 101, 250, 333, 480, 512, 600]
    for i in range(20):
        ln = lens[i % len(lens)]
        off = int(rng.integers(0, len(fwd) - ln))
        q = fwd[off:off + ln].copy()
        if rng.random() < 0.6:
            for _ in range(int(rng.integers(1, 6))):
                q[int(rng.integers(0, ln))] = int(rng.integers(0, 5))
        reads.append(Read(name=f"r{i}",
                          seq="".join(bases[b] if b < 4 else "N"
                                      for b in q),
                          qual="I" * len(q), comment=None))
    assert any(256 < len(r.seq) <= 512 for r in reads)
    assert any(len(r.seq) > 512 for r in reads)  # oversize splice path
    eng = JaxSeedingEngine(fm)
    assert eng.dev_max_len >= 512
    assert eng._seeder_for(400).L == 512
    chains = eng.chain_batch(opt, reads)
    if isinstance(chains, ChainBatch) and chains.flat is not None:
        chains = _chains_from_flat(chains.flat, len(reads))
    l_pac = fm.seq_len >> 1
    for r, got in zip(reads, chains):
        want = mem_chain(opt, fm, l_pac, r.seq_nt4)
        assert [(c.pos, list(map(tuple, c.seeds))) for c in got] == \
            [(c.pos, list(map(tuple, c.seeds))) for c in want], r.name
