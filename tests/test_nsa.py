"""Native bounded-memory index builder (native/saindex.cpp): SA-IS
fuzz-parity against the NumPy prefix-doubling oracle, and byte parity
of the assembled FmIndex artifacts.  This is the large-genome
construction role the reference fills with software/bwt_gen.c
(bwtindex.c:239) — any correct SA yields bit-identical artifacts."""
import numpy as np
import pytest

from bwamem_tpu.index import nsa
from bwamem_tpu.index.fmindex import FmIndex
from bwamem_tpu.index.suffix_array import suffix_array
import bwamem_tpu.index.fmindex as fmx

pytestmark = pytest.mark.skipif(not nsa.available(),
                                reason="native builder unavailable")


def test_sais_fuzz_vs_prefix_doubling():
    rng = np.random.default_rng(7)
    for _ in range(40):
        n = int(rng.integers(1, 2500))
        t = rng.integers(0, 4, size=n).astype(np.uint8)
        a = nsa.suffix_array_native(t)
        b = suffix_array(t)
        assert a.shape == b.shape
        assert (a.astype(np.int64) == b).all()


def test_sais_degenerate_texts():
    cases = [np.zeros(5, np.uint8), np.full(7, 3, np.uint8),
             np.tile(np.arange(4, dtype=np.uint8), 50),
             np.array([1], np.uint8), np.array([2, 2, 1], np.uint8)]
    for t in cases:
        a = nsa.suffix_array_native(t)
        b = suffix_array(t)
        assert (a.astype(np.int64) == b).all()


def test_fmindex_native_vs_numpy_byte_parity():
    rng = np.random.default_rng(11)
    for n in [100, 127, 128, 129, 4096, 65537]:
        t = rng.integers(0, 4, size=n).astype(np.uint8)
        fa = FmIndex.build(t)
        old = fmx._FORCE_NUMPY_SA
        fmx._FORCE_NUMPY_SA = True
        try:
            fb = FmIndex.build(t)
        finally:
            fmx._FORCE_NUMPY_SA = old
        assert fa.primary == fb.primary
        assert (fa.bwt == fb.bwt).all()
        assert (fa.sa == fb.sa).all()
        assert (fa.sa8 == fb.sa8).all()
        assert (fa.L2 == fb.L2).all()


def test_interleave_occ_native_parity():
    from bwamem_tpu.index.fmindex import interleave_occ
    rng = np.random.default_rng(3)
    for n in [1, 15, 16, 127, 128, 129, 1000, 10000]:
        bwt = rng.integers(0, 4, size=n).astype(np.uint8)
        a = nsa.interleave_occ_native(bwt, n)
        b = interleave_occ(bwt, n)
        assert (a == b).all(), n
