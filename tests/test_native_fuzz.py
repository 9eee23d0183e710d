"""End-to-end randomized differential: full native stack vs pure Python.

Generates a fresh random genome + mutated/indel'd/reverse-complemented
reads (inputs beyond the bundled dataset), runs the whole mem pipeline
twice — native chain/pack/regions/finalize ON vs all-Python — and
byte-compares every SAM record.  SE and PE.
"""

import copy
import os

import numpy as np
import pytest

import bwamem_tpu.core.pipeline as pl
import bwamem_tpu.ops.engine as eng
from bwamem_tpu.config import MemOptions, MEM_F_PE

nf = pytest.importorskip("bwamem_tpu.core.nfinalize")
if not nf.available():
    pytest.skip("native library unavailable", allow_module_level=True)

BASES = "ACGT"
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


class _Read:
    def __init__(self, name, seq):
        self.name = name
        self.seq = seq
        self.l_seq = len(seq)
        self.qual = "I" * len(seq)
        self.comment = None
        self.seq_nt4 = None
        self.sam = None


def _mutate(rng, s):
    out = list(s)
    for _ in range(int(rng.integers(0, 6))):
        i = int(rng.integers(0, len(out)))
        r = rng.random()
        if r < 0.6:
            out[i] = BASES[int(rng.integers(0, 4))]
        elif r < 0.8 and len(out) > 40:
            del out[i]
        else:
            out.insert(i, BASES[int(rng.integers(0, 4))])
    return "".join(out)


@pytest.fixture(scope="module")
def rand_index(tmp_path_factory):
    from bwamem_tpu.index.build import build_index, load_index
    rng = np.random.default_rng(1234)
    d = tmp_path_factory.mktemp("fuzzidx")
    fa = os.path.join(d, "g.fa")
    contigs = []
    with open(fa, "w") as f:
        for c, ln in enumerate((30000, 12000)):
            s = "".join(BASES[b] for b in rng.integers(0, 4, ln))
            contigs.append(s)
            f.write(f">ctg{c}\n")
            for i in range(0, ln, 70):
                f.write(s[i:i + 70] + "\n")
    build_index(fa)
    fm, bns = load_index(fa)
    return fm, bns, contigs, rng


def _make_reads(rng, contigs, n, L=101, paired=False, isize=300):
    reads = []
    genome = contigs
    for i in range(n):
        ctg = genome[int(rng.integers(0, len(genome)))]
        if paired:
            off = int(rng.integers(0, len(ctg) - isize - 50))
            frag = ctg[off:off + isize + int(rng.integers(-40, 40))]
            r1 = _mutate(rng, frag[:L])
            r2 = _mutate(rng, frag[-L:])
            r2 = "".join(COMP[b] for b in reversed(r2))
            reads.append(_Read(f"p{i}", r1))
            reads.append(_Read(f"p{i}", r2))
        else:
            off = int(rng.integers(0, len(ctg) - L))
            s = _mutate(rng, ctg[off:off + L])
            if rng.random() < 0.5:
                s = "".join(COMP[b] for b in reversed(s))
            if rng.random() < 0.05:  # junk read: likely unmapped
                s = "".join(BASES[b]
                            for b in rng.integers(0, 4, L))
            reads.append(_Read(f"r{i}", s))
    return reads


def _run(opt, fm, bns, reads, native: bool, pe: bool):
    old = eng.NATIVE_REGIONS
    env_fin = os.environ.get("BWAMEM_TPU_NATIVE_FINALIZE")
    try:
        eng.NATIVE_REGIONS = native
        if not native:
            os.environ["BWAMEM_TPU_NATIVE_FINALIZE"] = "0"
            # nfinalize caches the lib handle; gate at call sites
            import bwamem_tpu.core.nfinalize as nfi
            saved = nfi._lib
            nfi._lib = None
            nfi_loader = nfi._load

            def _no_load():
                return None

            nfi._load = _no_load
        engine = eng.JaxSeedingEngine(fm)
        rr = [copy.copy(r) for r in reads]
        pl.process_seqs(opt, fm, bns, bns.pac, 7000, rr, None, "fz",
                        engine, verbose=0)
        return [r.sam for r in rr]
    finally:
        eng.NATIVE_REGIONS = old
        if not native:
            import bwamem_tpu.core.nfinalize as nfi
            nfi._load = nfi_loader
            nfi._lib = saved
            if env_fin is None:
                os.environ.pop("BWAMEM_TPU_NATIVE_FINALIZE", None)
            else:
                os.environ["BWAMEM_TPU_NATIVE_FINALIZE"] = env_fin


def test_fuzz_se(rand_index):
    fm, bns, contigs, rng = rand_index
    reads = _make_reads(rng, contigs, 150)
    for r in reads:
        pl.encode_read(r)
    opt = MemOptions()
    sams_n = _run(opt, fm, bns, reads, native=True, pe=False)
    sams_p = _run(opt, fm, bns, reads, native=False, pe=False)
    assert sams_n == sams_p


def test_fuzz_pe(rand_index):
    fm, bns, contigs, rng = rand_index
    reads = _make_reads(rng, contigs, 60, paired=True)
    for r in reads:
        pl.encode_read(r)
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    sams_n = _run(opt, fm, bns, reads, native=True, pe=True)
    sams_p = _run(opt, fm, bns, reads, native=False, pe=True)
    assert sams_n == sams_p
