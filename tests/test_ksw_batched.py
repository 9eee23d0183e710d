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
