"""pemerge parity vs the reference C implementation (compiled
out-of-tree via ref_oracle; skipped when the checkout is absent)."""
import ctypes

import numpy as np
import pytest

from . import ref_oracle as RO
from bwamem_tpu.core.pemerge import PemOptions, pemerge_pair
from bwamem_tpu.io.fastq import Read


@pytest.mark.skipif(not RO.have_reference(), reason="no reference checkout")
def test_pemerge_parity_random_pairs():
    L = RO.build_pemerge()
    rng = np.random.default_rng(11)
    merges = 0
    for t in range(200):
        tl = int(rng.integers(60, 160))
        tpl = rng.integers(0, 4, tl)
        l1 = int(rng.integers(40, min(101, tl)))
        l2 = int(rng.integers(40, min(101, tl)))
        r1 = tpl[:l1].copy()
        frag2 = tpl[tl - l2:].copy()
        for arr in (r1, frag2):
            nm = rng.integers(0, 4)
            arr[rng.integers(0, len(arr), nm)] = rng.integers(0, 4, nm)
        if t % 7 == 0:
            r1 = rng.integers(0, 4, l1)  # unrelated pair
        s1 = "".join("ACGT"[c] for c in r1)
        s2 = "".join("TGCA"[c] for c in frag2[::-1])
        q1 = "".join(chr(33 + int(v)) for v in rng.integers(20, 41, l1))
        q2 = "".join(chr(33 + int(v)) for v in rng.integers(20, 41, l2))
        sb = ctypes.create_string_buffer(2048)
        qb = ctypes.create_string_buffer(2048)
        ret_c = L.shim_pemerge(10, s1.encode(), q1.encode(), s2.encode(),
                               q2.encode(), sb, qb, 2048)
        x0, x1 = Read("r", None, s1, q1), Read("r", None, s2, q2)
        ret_p = pemerge_pair(PemOptions(), x0, x1)
        assert ret_c == ret_p, t
        if ret_c == 0:
            merges += 1
            assert x0.seq == sb.value.decode(), t
            assert x0.qual == qb.value.decode(), t
    assert merges > 50  # the generator must actually exercise merging
