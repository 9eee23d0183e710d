"""Native (C++) scalar SW kernels vs the pure-Python specs.

native/ksw.cpp must be bit-identical to oracle/ksw.py's
ksw_extend2_py / ksw_global2_py / ksw_align2_py on every field,
including the striped kernels' virtual-padding + u8-saturation
bookkeeping and the z-drop/gscore logic of the extension.
"""

import numpy as np
import pytest

from bwamem_tpu.oracle import ksw as K
from bwamem_tpu.config import fill_scmat

nksw = pytest.importorskip("bwamem_tpu.oracle.nksw")
if not nksw.available():
    pytest.skip("native library unavailable", allow_module_level=True)

MAT = np.asarray(fill_scmat(1, 4), dtype=np.int64)


def _pair(rng, qlen, tlen, related):
    q = rng.integers(0, 5, qlen).astype(np.uint8)
    t = rng.integers(0, 5, tlen).astype(np.uint8)
    if related and qlen and tlen:
        L = min(qlen, tlen)
        t[:L] = q[:L]
        idx = rng.integers(0, L, max(1, L // 10))
        t[idx] = (t[idx] + 1) % 5
    return q, t


def test_extend2_parity():
    rng = np.random.default_rng(11)
    for it in range(120):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(0, 400))
        q, t = _pair(rng, qlen, tlen, it % 2 == 0)
        w = int(rng.integers(1, 101))
        h0 = int(rng.integers(0, 120))
        zdrop = [0, 100, -1][it % 3]
        eb = int(rng.integers(0, 10))
        a = K.ksw_extend2_py(q, t, MAT, 6, 1, 6, 1, w, eb, zdrop, h0)
        b = nksw.ksw_extend2(q, t, MAT, 6, 1, 6, 1, w, eb, zdrop, h0)
        assert tuple(a) == tuple(b), (it, a, b)


def test_global2_parity():
    rng = np.random.default_rng(12)
    for it in range(120):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(1, 200))
        q, t = _pair(rng, qlen, tlen, it % 2 == 0)
        w = max(int(rng.integers(1, 101)), abs(qlen - tlen) + 3)
        sa, ca = K.ksw_global2_py(q, t, MAT, 6, 1, 6, 1, w)
        sb, cb = nksw.ksw_global2(q, t, MAT, 6, 1, 6, 1, w)
        assert sa == sb and list(ca) == list(cb), (it, sa, sb, ca, cb)


def test_align2_parity():
    rng = np.random.default_rng(13)
    for it in range(60):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(1, 300))
        q, t = _pair(rng, qlen, tlen, it % 2 == 0)
        for xtra in (K.KSW_XSUBO | K.KSW_XSTART | K.KSW_XBYTE | 30,
                     K.KSW_XSUBO | K.KSW_XSTART | 30,
                     K.KSW_XSTART, 0):
            ra = K.ksw_align2_py(q, t, MAT, 6, 1, 6, 1, xtra)
            rb = nksw.ksw_align2(q, t, MAT, 6, 1, 6, 1, xtra)
            assert (ra.score, ra.te, ra.qe, ra.score2, ra.te2, ra.tb,
                    ra.qb) == (rb.score, rb.te, rb.qe, rb.score2,
                               rb.te2, rb.tb, rb.qb), (it, xtra, ra, rb)


def test_dispatch_uses_native():
    # the public oracle entry points delegate to the native kernels here
    assert K._native()
    q = np.array([0, 1, 2, 3] * 10, dtype=np.uint8)
    t = np.array([0, 1, 2, 3] * 12, dtype=np.uint8)
    assert K.ksw_extend2(q, t, MAT, 6, 1, 6, 1, 50, 5, 100, 40) == \
        K.ksw_extend2_py(q, t, MAT, 6, 1, 6, 1, 50, 5, 100, 40)
