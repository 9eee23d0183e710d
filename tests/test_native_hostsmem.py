"""Native host-oracle parity (native/hostsmem.cpp): smem1 and the
SA walk must match the pure-Python executable spec exactly."""
import numpy as np
import pytest

from bwamem_tpu.index.fmindex import FmIndex
from bwamem_tpu.oracle import nsmem
from bwamem_tpu.oracle.smem import _smem1_py

pytestmark = pytest.mark.skipif(not nsmem.available(),
                                reason="native oracle unavailable")


@pytest.fixture(scope="module")
def small_fm():
    rng = np.random.default_rng(19)
    fwd = rng.integers(0, 4, 5000).astype(np.uint8)
    return fwd, FmIndex.build(np.concatenate([fwd, 3 - fwd[::-1]]))


def test_smem1_fuzz_parity(small_fm):
    fwd, fm = small_fm
    rng = np.random.default_rng(29)
    for trial in range(120):
        n = int(rng.integers(21, 257))
        off = int(rng.integers(0, len(fwd) - n))
        q = fwd[off:off + n].copy()
        if rng.random() < 0.5:
            for _ in range(int(rng.integers(1, 5))):
                q[int(rng.integers(0, n))] = int(rng.integers(0, 5))
        if trial % 7 == 0:  # low-complexity
            q = np.tile(fwd[off:off + 6], (n + 5) // 6)[:n].copy()
        x = int(rng.integers(0, n))
        mi = int(rng.integers(1, 12))
        want = _smem1_py(fm, q, x, mi)
        got = nsmem.smem1_native(fm, q, x, mi)
        assert got == want, (trial, n, x, mi)


def test_sa_lookup_batch_parity(small_fm):
    fwd, fm = small_fm
    rng = np.random.default_rng(31)
    ks = rng.integers(0, fm.seq_len + 1, 400).astype(np.int64)
    ks[0] = 0
    ks[1] = int(fm.primary)

    def py_walk(k):
        sa = 0
        mask = fm.sa_intv - 1
        while k & mask:
            sa += 1
            k = fm.inv_psi(k)
        return sa + int(fm.sa[k // fm.sa_intv])

    want = np.asarray([py_walk(int(k)) for k in ks], np.int64)
    got = nsmem.sa_lookup_batch_native(fm, ks)
    np.testing.assert_array_equal(got, want)
    # int32-sampled variant (the native index builder's dtype)
    fm32 = FmIndex(primary=fm.primary, L2=fm.L2, seq_len=fm.seq_len,
                   bwt=fm.bwt, sa_intv=fm.sa_intv,
                   sa=fm.sa.astype(np.int32))
    got32 = nsmem.sa_lookup_batch_native(fm32, ks)
    np.testing.assert_array_equal(got32, want)
