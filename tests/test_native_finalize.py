"""Native (C++) single-end finalize vs the Python path.

native/finalize.cpp must produce byte-identical read.sam strings to
mark_primary + reg2sam_se_gen + aln2sam for every flag combination,
including -a (ALL), RG tags, supplementary hard-clipping and SA tags.
"""

import copy
import pickle

import pytest

import bwamem_tpu.core.pipeline as pl
from bwamem_tpu.config import MemOptions, MEM_F_ALL
from bwamem_tpu.core.region import mark_primary
from bwamem_tpu.core.swdrive import drive_host
from bwamem_tpu.io.fastq import ChunkReader

nf = pytest.importorskip("bwamem_tpu.core.nfinalize")
if not nf.available():
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def aligned(ref_index, data_dir):
    import os
    fm, bns = ref_index
    opt = MemOptions()
    reads = ChunkReader(os.path.join(data_dir, "reads_se.fq")) \
        .read_chunk(1 << 30)[:192]
    for r in reads:
        pl.encode_read(r)
    regs = [pl.align1_core(opt, fm, bns, bns.pac, r) for r in reads]
    return bns, reads, regs


@pytest.mark.parametrize("flag,rg", [(0, ""), (0, "sample1"),
                                     (MEM_F_ALL, "")])
def test_finalize_se_parity(aligned, flag, rg):
    bns, reads, regs0 = aligned
    opt = MemOptions()
    opt.flag |= flag
    r1 = [copy.copy(r) for r in reads]
    r2 = [copy.copy(r) for r in reads]
    regs1 = pickle.loads(pickle.dumps(regs0))
    regs2 = pickle.loads(pickle.dumps(regs0))
    assert nf.finalize_se_native(opt, bns, r1, regs1, 991, rg)
    for i, r in enumerate(r2):
        mark_primary(opt, regs2[i], 991 + i)
        drive_host(pl.reg2sam_se_gen(opt, bns, bns.pac, r, regs2[i], 0,
                                     None, rg), opt)
    for a, b in zip(r1, r2):
        assert a.sam == b.sam, a.name
