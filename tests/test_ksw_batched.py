"""Batched device SW kernels vs the scalar host oracles (the
reference's HW-vs-SW parity contract, SURVEY.md §4)."""
import numpy as np
import pytest

import jax.numpy as jnp

from bwamem_tpu.config import MemOptions
from bwamem_tpu.oracle.ksw import ksw_extend2, ksw_global2
from bwamem_tpu.ops.ksw import (ksw_extend2_batched, ksw_global2_batched,
                                cigar_from_traceback)


@pytest.fixture(scope="module")
def opt():
    return MemOptions()


def _mutated_pair(rng, ql, tl, related=True):
    q = rng.integers(0, 4, ql)
    if related and tl >= ql:
        tgt = np.concatenate([q, rng.integers(0, 4, tl - ql)])
        nmut = rng.integers(0, max(1, ql // 5))
        idx = rng.integers(0, tl, nmut)
        tgt[idx] = rng.integers(0, 4, nmut)
    else:
        tgt = rng.integers(0, 4, tl)
    return q, tgt


def test_extend2_batched_parity(opt):
    mat = np.asarray(opt.mat, dtype=np.int64)
    rng = np.random.default_rng(3)
    cases = []
    for t in range(120):
        ql = int(rng.integers(1, 101))
        tl = int(rng.integers(1, 300))
        q, tgt = _mutated_pair(rng, ql, tl, related=(t % 3 != 2))
        cases.append((q, tgt, int(rng.choice([100, 200, 13])),
                      int(rng.choice([5, 10])), int(rng.integers(1, 120))))
    LQ, LT = 101, 304
    B = len(cases)
    qb = np.full((B, LQ), 4, np.int32)
    tb = np.full((B, LT), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    ebv = np.zeros(B, np.int32)
    h0v = np.zeros(B, np.int32)
    for i, (q, tgt, w, eb, h0) in enumerate(cases):
        qb[i, :len(q)] = q
        tb[i, :len(tgt)] = tgt
        qlen[i], tlen[i] = len(q), len(tgt)
        wv[i], ebv[i], h0v[i] = w, eb, h0
    out = ksw_extend2_batched(
        jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(mat.astype(np.int32)),
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
        jnp.asarray(wv), jnp.asarray(ebv), opt.zdrop,
        jnp.asarray(h0v), LQ=LQ, LT=LT)
    out = [np.asarray(o) for o in out]
    for i, (q, tgt, w, eb, h0) in enumerate(cases):
        want = ksw_extend2(q, tgt, mat, opt.o_del, opt.e_del, opt.o_ins,
                           opt.e_ins, w, eb, opt.zdrop, h0)
        assert tuple(int(o[i]) for o in out) == tuple(want), i


def test_global2_batched_parity(opt):
    mat = np.asarray(opt.mat, dtype=np.int64)
    rng = np.random.default_rng(5)
    cases = []
    for t in range(120):
        ql = int(rng.integers(1, 120))
        tl = max(1, ql + int(rng.integers(-8, 9)))
        q, tgt = _mutated_pair(rng, ql, tl, related=(t % 5 != 0))
        w = max(int(rng.choice([10, 25, 100, 3])), abs(tl - ql) + 3)
        cases.append((q, tgt, w))
    LQ, LT = 128, 136
    B = len(cases)
    qb = np.full((B, LQ), 4, np.int32)
    tb = np.full((B, LT), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    for i, (q, tgt, w) in enumerate(cases):
        qb[i, :len(q)] = q
        tb[i, :len(tgt)] = tgt
        qlen[i], tlen[i], wv[i] = len(q), len(tgt), w
    score, ops, n_ops, ri, rk = ksw_global2_batched(
        jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(mat.astype(np.int32)),
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
        jnp.asarray(wv), LQ=LQ, LT=LT)
    score, ops, n_ops, ri, rk = map(np.asarray, (score, ops, n_ops, ri, rk))
    for i, (q, tgt, w) in enumerate(cases):
        want_sc, want_cig = ksw_global2(q, tgt, mat, opt.o_del, opt.e_del,
                                        opt.o_ins, opt.e_ins, w)
        assert int(score[i]) == want_sc, i
        assert cigar_from_traceback(ops[i], int(n_ops[i]), int(ri[i]),
                                    int(rk[i])) == want_cig, i


def test_align2_wave_parity(opt):
    """Batched local-SW wave (ksw_align2 equivalent) vs the striped
    oracle, including second-best bookkeeping and start positions."""
    from bwamem_tpu.oracle import ksw as oksw
    from bwamem_tpu.ops.ksw_align import align2_wave
    rng = np.random.default_rng(9)
    mat = np.asarray(opt.mat, dtype=np.int64)
    reqs = []
    for t in range(40):
        ql = int(rng.integers(10, 101))
        tl = int(rng.integers(20, 400))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        tgt = rng.integers(0, 4, tl).astype(np.uint8)
        if t % 2 == 0 and tl > ql:
            off = int(rng.integers(0, tl - ql))
            tgt[off:off + ql] = q
            nm = rng.integers(0, 5)
            tgt[rng.integers(0, tl, nm)] = rng.integers(0, 4, nm)
        xtra = (oksw.KSW_XSUBO | oksw.KSW_XSTART
                | (oksw.KSW_XBYTE if t % 3 else 0)
                | (opt.min_seed_len * opt.a))
        reqs.append(("align2", q, tgt, xtra))
    outs = align2_wave(opt, reqs, 64)
    for i, (_, q, tgt, xtra) in enumerate(reqs):
        want = oksw.ksw_align2(q, tgt, mat, opt.o_del, opt.e_del,
                               opt.o_ins, opt.e_ins, xtra)
        got = outs[i]
        assert (got.score, got.te, got.qe, got.score2, got.te2,
                got.tb, got.qb) == (want.score, want.te, want.qe,
                                    want.score2, want.te2, want.tb,
                                    want.qb), i
