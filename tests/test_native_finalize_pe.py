"""Native (C++) paired-end finalize vs the Python path.

bm_finalize_pe must be byte-identical to sam_pe_gen for every pair:
mate rescue (matesw + sort_and_dedup insertion), mem_pair's erfc/log
pairing score and hash tie-breaks, q_pe/q_se reconciliation, unmapped
mate copying, and the no-pairing fallback.
"""

import copy
import os
import pickle

import pytest

import bwamem_tpu.core.pair as pe
import bwamem_tpu.core.pipeline as pl
from bwamem_tpu.config import MemOptions, MEM_F_PE, MEM_F_NOPAIRING
from bwamem_tpu.core.swdrive import drive_host
from bwamem_tpu.io.fastq import ChunkReader

nf = pytest.importorskip("bwamem_tpu.core.nfinalize")
if not nf.available():
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def aligned(ref_index, data_dir):
    fm, bns = ref_index
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    reads = ChunkReader(os.path.join(data_dir, "reads_1.fq"),
                        os.path.join(data_dir, "reads_2.fq")) \
        .read_chunk(1 << 30)[:240]
    for r in reads:
        pl.encode_read(r)
    regs = [pl.align1_core(opt, fm, bns, bns.pac, r) for r in reads]
    pes = pe.pestat(opt, bns.l_pac, regs, verbose=0)
    return bns, reads, regs, pes


def _run_both(bns, opt, pes, reads, regs0, n_processed, rg):
    r1 = [copy.copy(r) for r in reads]
    r2 = [copy.copy(r) for r in reads]
    regs1 = pickle.loads(pickle.dumps(regs0))
    regs2 = pickle.loads(pickle.dumps(regs0))
    assert nf.finalize_pe_native(opt, bns, pes, r1, regs1, n_processed, rg)
    for i in range(len(r2) >> 1):
        drive_host(pe.sam_pe_gen(opt, bns, bns.pac, pes,
                                 (n_processed >> 1) + i,
                                 (r2[i << 1], r2[i << 1 | 1]),
                                 (regs2[i << 1], regs2[i << 1 | 1]), rg),
                   opt)
    for a, b in zip(r1, r2):
        assert a.sam == b.sam, a.name


def test_finalize_pe_parity(aligned):
    bns, reads, regs, pes = aligned
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    _run_both(bns, opt, pes, reads, regs, 200, "rg1")


def test_finalize_pe_rescue_and_unmapped(aligned):
    # empty every 3rd pair's second end: exercises matesw rescue and
    # the unmapped-mate copy logic in aln2sam
    bns, reads, regs, pes = aligned
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    regs_mod = pickle.loads(pickle.dumps(regs))
    for i in range(0, len(regs_mod), 6):
        regs_mod[i + 1] = []
    _run_both(bns, opt, pes, reads, regs_mod, 0, "")


def test_finalize_pe_nopairing(aligned):
    bns, reads, regs, pes = aligned
    opt = MemOptions()
    opt.flag |= MEM_F_PE | MEM_F_NOPAIRING
    _run_both(bns, opt, pes, reads, regs, 64, "")
