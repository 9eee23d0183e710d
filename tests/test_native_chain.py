"""Native (C++) seed chaining vs the Python ChainTree loop.

bm_chain_batch must reproduce mem_chain's kbtree semantics exactly:
bisect_right predecessor queries, test_and_merge's contained/strand/
band/gap predicates, bridging-seed drops, and the in-order traversal
that fixes the final chain order.
"""

import copy
import os

import numpy as np
import pytest

from bwamem_tpu.config import MemOptions
from bwamem_tpu.io.fastq import ChunkReader

nf = pytest.importorskip("bwamem_tpu.core.nfinalize")
if not nf.available():
    pytest.skip("native library unavailable", allow_module_level=True)


def test_chain_batch_parity(ref_index, data_dir):
    import bwamem_tpu.ops.engine as eng
    fm, bns = ref_index
    opt = MemOptions()
    reads = ChunkReader(os.path.join(data_dir, "reads_se.fq")) \
        .read_chunk(1 << 30)[:160]
    engine = eng.JaxSeedingEngine(fm)
    old = eng.NATIVE_REGIONS
    try:
        eng.NATIVE_REGIONS = True
        c1 = engine.chain_batch(opt, [copy.copy(r) for r in reads])
        if isinstance(c1, eng.ChainBatch):  # flat-only fast path
            assert c1.flat is not None
            c1 = eng._chains_from_flat(c1.flat, len(reads))
        eng.NATIVE_REGIONS = False
        c2 = engine.chain_batch(opt, [copy.copy(r) for r in reads])
    finally:
        eng.NATIVE_REGIONS = old

    def norm(cs):
        return [[(ch.pos, [tuple(int(v) for v in s) for s in ch.seeds])
                 for ch in c] for c in cs]

    assert norm(c1) == norm(c2)


def test_chain_batch_randomized():
    """Random seed streams through the raw C entry vs the Python
    ChainTree (no device needed)."""
    from bwamem_tpu.core.chain import Chain, ChainTree, _test_and_merge
    from bwamem_tpu.core.nfinalize import chain_batch_native
    opt = MemOptions()
    rng = np.random.default_rng(21)
    l_pac = 100_000
    for trial in range(60):
        n = int(rng.integers(1, 60))
        rbeg = rng.integers(0, 2 * l_pac, n).astype(np.int64)
        # cluster some seeds to exercise merging
        for j in range(1, n, 3):
            rbeg[j] = min(rbeg[j - 1] + int(rng.integers(0, 60)),
                          2 * l_pac - 1)
        qbeg = rng.integers(0, 90, n).astype(np.int32)
        slen = rng.integers(19, 40, n).astype(np.int32)
        read_off = np.asarray([0, n], dtype=np.int64)
        out = chain_batch_native(l_pac, opt.w, opt.max_chain_gap, 1,
                                 read_off, rbeg, qbeg, slen)
        assert out is not None
        c_off, sd_off, o_rb, o_qb, o_ln = out
        native = []
        for c in range(int(c_off[0]), int(c_off[1])):
            lo, hi = int(sd_off[c]), int(sd_off[c + 1])
            native.append([(int(o_rb[k]), int(o_qb[k]), int(o_ln[k]))
                           for k in range(lo, hi)])
        # Python reference loop (engine.chain_batch's insertion logic)
        tree = ChainTree()
        for k in range(n):
            s = (int(rbeg[k]), int(qbeg[k]), int(slen[k]))
            if s[0] < l_pac < s[0] + s[2]:
                continue
            to_add = False
            if len(tree):
                low = tree.lower(s[0])
                if low is None or not _test_and_merge(opt, l_pac, low, s):
                    to_add = True
            else:
                to_add = True
            if to_add:
                tree.insert(Chain(pos=s[0], seeds=[s]))
        pyc = [[tuple(s) for s in ch.seeds] for ch in tree.chains]
        assert native == pyc, trial
