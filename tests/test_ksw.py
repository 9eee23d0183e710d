"""Randomized parity of the SW kernels against the reference C code."""
import numpy as np
import pytest

from bwamem_tpu.oracle import ksw as K

from . import ref_oracle as RO

pytestmark = pytest.mark.skipif(not RO.have_reference(),
                                reason="reference checkout unavailable")


def fill_scmat(a, b):
    mat = np.zeros(25, dtype=np.int64)
    k = 0
    for i in range(4):
        for j in range(4):
            mat[k] = a if i == j else -b
            k += 1
        mat[k] = -1
        k += 1
    for j in range(5):
        mat[k] = -1
        k += 1
    return mat


@pytest.fixture(scope="module")
def lib():
    return RO.load()


def rand_pair(rng, qlen, tlen, div=0.1):
    t = rng.integers(0, 4, size=tlen).astype(np.uint8)
    q = t[:qlen].copy()
    nmut = int(len(q) * div)
    for _ in range(nmut):
        pos = int(rng.integers(0, len(q)))
        q[pos] = (q[pos] + 1 + rng.integers(0, 3)) % 4
    return q.astype(np.uint8), t


def test_extend2_parity(lib):
    rng = np.random.default_rng(42)
    mat = fill_scmat(1, 4)
    for trial in range(200):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(1, 240))
        q, t = rand_pair(rng, min(qlen, tlen), tlen, div=0.15)
        w = int(rng.choice([10, 100, 200]))
        h0 = int(rng.integers(1, 120))
        ours = K.ksw_extend2(q, t, mat, 6, 1, 6, 1, w, 5, 100, h0)
        ref = RO.ref_extend2(lib, q, t, mat, 6, 1, 6, 1, w, 5, 100, h0)
        assert ours == ref, (trial, ours, ref)


def test_global2_parity(lib):
    rng = np.random.default_rng(43)
    mat = fill_scmat(1, 4)
    for trial in range(200):
        tlen = int(rng.integers(5, 200))
        qlen = max(1, tlen + int(rng.integers(-8, 9)))
        q, t = rand_pair(rng, min(qlen, tlen), tlen, div=0.1)
        q = np.resize(q, qlen).astype(np.uint8)
        w = max(int(rng.choice([3, 10, 50])), abs(qlen - tlen) + 3)
        sc_o, cig_o = K.ksw_global2(q, t, mat, 6, 1, 6, 1, w)
        sc_r, cig_r = RO.ref_global2(lib, q, t, mat, 6, 1, 6, 1, w)
        assert sc_o == sc_r, trial
        assert cig_o == cig_r, (trial, cig_o, cig_r)


def test_align2_parity(lib):
    rng = np.random.default_rng(44)
    mat = fill_scmat(1, 4)
    for trial in range(200):
        tlen = int(rng.integers(20, 250))
        qlen = int(rng.integers(10, 120))
        q, t = rand_pair(rng, min(qlen, tlen), tlen, div=0.12)
        q = np.resize(q, qlen).astype(np.uint8)
        xtra = K.KSW_XSUBO | K.KSW_XSTART | 19
        if qlen * 1 < 250:
            xtra |= K.KSW_XBYTE
        r_o = K.ksw_align2(q, t, mat, 6, 1, 6, 1, xtra)
        r_r = RO.ref_align2(lib, q, t, mat, 6, 1, 6, 1, xtra)
        got = (r_o.score, r_o.te, r_o.qe, r_o.score2, r_o.te2, r_o.tb, r_o.qb)
        want = (r_r.score, r_r.te, r_r.qe, r_r.score2, r_r.te2, r_r.tb, r_r.qb)
        assert got == want, (trial, got, want)
