"""Native (C++) region construction vs the Python generator machinery.

bm_regions_batch consumes the speculative extension wave's per-seed
results positionally and must reproduce the exact serial bookkeeping:
mem_chain_flt's introsort permutation + overlap filter, the
chain2aln_short local-SW fast path, per-seed containment/confirm
logic, seedcov, and sort_and_dedup.
"""

import copy
import os

import pytest

from bwamem_tpu.config import MemOptions
from bwamem_tpu.io.fastq import ChunkReader

nf = pytest.importorskip("bwamem_tpu.core.nfinalize")
if not nf.available():
    pytest.skip("native library unavailable", allow_module_level=True)


def _fields(regs):
    return [[(p.rb, p.re, p.qb, p.qe, p.score, p.truesc, p.csub, p.w,
              p.seedcov) for p in g] for g in regs]


def test_regions_batch_parity(ref_index, data_dir):
    import bwamem_tpu.ops.engine as eng
    fm, bns = ref_index
    opt = MemOptions()
    reads = ChunkReader(os.path.join(data_dir, "reads_se.fq")) \
        .read_chunk(1 << 30)[:160]
    engine = eng.JaxSeedingEngine(fm)

    calls = {"n": 0}
    orig = engine._align_batch_native

    def probe(*a, **kw):
        out = orig(*a, **kw)
        if out is not None:
            calls["n"] += 1
        return out

    old_flag = eng.NATIVE_REGIONS
    try:
        engine._align_batch_native = probe
        eng.NATIVE_REGIONS = True
        r1 = [copy.copy(r) for r in reads]
        regs1 = engine.align_batch(opt, fm, bns, bns.pac, r1)
        assert calls["n"] == 1, "fully-native align path did not run"
        eng.NATIVE_REGIONS = False
        r2 = [copy.copy(r) for r in reads]
        regs2 = engine.align_batch(opt, fm, bns, bns.pac, r2)
    finally:
        eng.NATIVE_REGIONS = old_flag
        engine._align_batch_native = orig
    assert _fields(regs1) == _fields(regs2)
