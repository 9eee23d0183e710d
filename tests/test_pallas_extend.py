"""Parity: the Pallas banded-extension kernel vs the XLA row loop.

The Pallas kernel (ops/pallas_extend.py) must be lane-for-lane
identical to ops.ksw._extend_impl — which is itself verified against
the scalar host oracle (test_ksw_batched.py).  Runs in interpreter
mode on CPU; the TPU Mosaic path is exercised by bench/microbench.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bwamem_tpu.ops import ksw
from bwamem_tpu.ops.pallas_extend import (extend_pallas,
                                          extend_pallas_available)


def _mat():
    m = np.zeros(25, np.int32)
    for i in range(4):
        for j in range(4):
            m[i * 5 + j] = 1 if i == j else -4
    for k in range(5):
        m[k * 5 + 4] = -1
        m[4 * 5 + k] = -1
    return m


@pytest.mark.skipif(not extend_pallas_available(), reason="no pallas")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_extend_parity(monkeypatch, seed):
    monkeypatch.setenv("BWAMEM_TPU_PALLAS_EXTEND", "0")  # ref = XLA
    B, LQ, LT = 16, 32, 64
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, size=(B, LQ)).astype(np.int8)
    t = rng.integers(0, 4, size=(B, LT)).astype(np.int8)
    for b in range(0, B, 2):   # near-matching lanes extend deep
        t[b, :LQ] = q[b, :LQ]
        t[b, rng.integers(0, LQ, size=3)] = 3 - t[b, 0]
    qlen = rng.integers(1, LQ + 1, size=B).astype(np.int32)
    tlen = rng.integers(0, LT + 1, size=B).astype(np.int32)
    w = rng.integers(1, 101, size=B).astype(np.int32)
    eb = rng.integers(0, 6, size=B).astype(np.int32)
    h0 = rng.integers(0, 40, size=B).astype(np.int32)
    act = rng.random(B) > 0.2
    mat = _mat()

    ref = ksw._extend_impl(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(mat), 6, 1, 6, 1,
        jnp.asarray(w), jnp.asarray(eb), 100, jnp.asarray(h0),
        LQ, LT, jnp.asarray(act))

    # pallas path: replicate the prologue (widen, clamp w, done0)
    i32 = jnp.int32
    qlen_f = jnp.asarray(qlen).astype(jnp.float64)
    msc = jnp.max(jnp.asarray(mat)).astype(i32)
    mi = jnp.maximum((((qlen_f * msc + eb - 6) / 1 + 1.0)).astype(i32),
                     1)
    wc = jnp.minimum(jnp.minimum(jnp.asarray(w), mi), mi)
    done0 = (jnp.asarray(tlen) <= 0) | ~jnp.asarray(act)
    pal = extend_pallas(jnp.asarray(q).astype(i32),
                        jnp.asarray(t).astype(i32),
                        jnp.asarray(qlen), jnp.asarray(tlen),
                        jnp.asarray(mat), 6, 1, 6, 1, wc, 100,
                        jnp.maximum(jnp.asarray(h0), 0), done0, LQ, LT)

    live = act & (tlen > 0)
    for name, r, p in zip(
            ["best", "qle", "tle", "gtle", "gscore", "max_off"],
            ref, pal):
        np.testing.assert_array_equal(np.asarray(r)[live],
                                      np.asarray(p)[live],
                                      err_msg=name)
