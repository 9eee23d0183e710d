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


def test_sais_i64_fuzz_vs_i32(monkeypatch):
    """The int64 entry points (bt_sais_bases_64 / bt_bwt_from_sa64) are
    the path human-scale (>2^31-char) construction takes; force small
    texts through them and require identical SA/BWT/primary."""
    rng = np.random.default_rng(19)
    for _ in range(25):
        n = int(rng.integers(1, 3000))
        t = rng.integers(0, 4, size=n).astype(np.uint8)
        monkeypatch.delenv("BWAMEM_TPU_NSA_FORCE_I64", raising=False)
        sa32 = nsa.suffix_array_native(t)
        bwt32, pri32 = nsa.bwt_from_sa(t, sa32)
        assert sa32.dtype == np.int32
        monkeypatch.setenv("BWAMEM_TPU_NSA_FORCE_I64", "1")
        sa64 = nsa.suffix_array_native(t)
        bwt64, pri64 = nsa.bwt_from_sa(t, sa64)
        assert sa64.dtype == np.int64
        assert (sa32.astype(np.int64) == sa64).all()
        assert (bwt32 == bwt64).all()
        assert pri32 == pri64


def test_fmindex_i64_builder_byte_parity(monkeypatch):
    """Full FmIndex.build through the forced-int64 native builder must
    yield byte-identical artifacts (the at-scale 3 Gbp build only
    differs from this by n)."""
    rng = np.random.default_rng(23)
    for n in [100, 129, 4096]:
        t = rng.integers(0, 4, size=n).astype(np.uint8)
        monkeypatch.delenv("BWAMEM_TPU_NSA_FORCE_I64", raising=False)
        fa = FmIndex.build(t)
        monkeypatch.setenv("BWAMEM_TPU_NSA_FORCE_I64", "1")
        fb = FmIndex.build(t)
        assert fa.primary == fb.primary
        assert (fa.bwt == fb.bwt).all()
        assert (fa.sa == fb.sa).all()
        assert (fa.L2 == fb.L2).all()


def test_interleave_occ_native_parity():
    from bwamem_tpu.index.fmindex import interleave_occ
    rng = np.random.default_rng(3)
    for n in [1, 15, 16, 127, 128, 129, 1000, 10000]:
        bwt = rng.integers(0, 4, size=n).astype(np.uint8)
        a = nsa.interleave_occ_native(bwt, n)
        b = interleave_occ(bwt, n)
        assert (a == b).all(), n
