"""Parity check: pallas_extend vs the XLA _extend_impl row loop."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ["BWAMEM_TPU_PALLAS_EXTEND"] = "0"   # XLA path for reference

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from bwamem_tpu.ops import ksw
from bwamem_tpu.ops.pallas_extend import extend_pallas

rng = np.random.default_rng(0)


def run_case(B, LQ, LT, seed):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, size=(B, LQ)).astype(np.int8)
    t = rng.integers(0, 4, size=(B, LT)).astype(np.int8)
    # make some lanes near-matching so extensions actually run deep
    for b in range(0, B, 2):
        n = min(LQ, LT)
        t[b, :n] = q[b, :n]
        muts = rng.integers(0, n, size=max(1, n // 10))
        t[b, muts] = (t[b, muts] + 1) % 4
    qlen = rng.integers(1, LQ + 1, size=B).astype(np.int32)
    tlen = rng.integers(0, LT + 1, size=B).astype(np.int32)
    tlen[0] = 0
    w = rng.integers(1, 101, size=B).astype(np.int32)
    eb = rng.integers(0, 6, size=B).astype(np.int32)
    h0 = rng.integers(0, 40, size=B).astype(np.int32)
    mat = np.zeros(25, np.int32)
    a_, b_ = 1, 4
    for i in range(4):
        for j in range(4):
            mat[i * 5 + j] = a_ if i == j else -b_
    mat[4 * 5:] = -1
    for k in range(5):
        mat[k * 5 + 4] = -1
    act = rng.random(B) > 0.2

    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
            jnp.asarray(tlen), jnp.asarray(mat),
            6, 1, 6, 1,
            jnp.asarray(w), jnp.asarray(eb), 100, jnp.asarray(h0))

    ref = ksw._extend_impl(*args, LQ, LT, jnp.asarray(act))
    ref = [np.asarray(r) for r in ref]

    # pallas path: replicate the prologue (widen, clamp w) exactly
    i32 = jnp.int32
    qlen_f = jnp.asarray(qlen).astype(jnp.float64)
    max_sc = jnp.max(jnp.asarray(mat)).astype(i32)
    max_ins = (((qlen_f * max_sc + jnp.asarray(eb) - 6) / 1 + 1.0)
               .astype(i32))
    max_ins = jnp.maximum(max_ins, 1)
    wc = jnp.minimum(jnp.asarray(w), max_ins)
    max_del = (((qlen_f * max_sc + jnp.asarray(eb) - 6) / 1 + 1.0)
               .astype(i32))
    wc = jnp.minimum(wc, jnp.maximum(max_del, 1))
    done0 = (jnp.asarray(tlen) <= 0) | ~jnp.asarray(act)
    pal = extend_pallas(jnp.asarray(q).astype(i32),
                        jnp.asarray(t).astype(i32),
                        jnp.asarray(qlen), jnp.asarray(tlen),
                        jnp.asarray(mat), 6, 1, 6, 1, wc, 100,
                        jnp.maximum(jnp.asarray(h0), 0), done0, LQ, LT)
    pal = [np.asarray(r) for r in pal]

    names = ["best", "qle", "tle", "gtle", "gscore", "max_off"]
    ok = True
    for nm, r, p in zip(names, ref, pal):
        # masked-off / empty lanes: outputs only matter where the
        # caller reads them (active & tlen>0), same as the XLA path
        live = act & (tlen > 0)
        if not np.array_equal(r[live], p[live]):
            bad = np.nonzero(r[live] != p[live])[0][:5]
            print(f"MISMATCH {nm} case seed={seed}: idx {bad}",
                  r[live][bad], "vs", p[live][bad])
            ok = False
    return ok


allok = True
for seed in range(8):
    allok &= run_case(16, 32, 64, seed)
allok &= run_case(8, 128, 544, 100)
allok &= run_case(128, 128, 544, 101)
print("PASS" if allok else "FAIL")
