"""Parity: the Pallas global-alignment kernel vs the XLA path."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwamem_tpu.ops import ksw
from bwamem_tpu.ops.pallas_global import (global_pallas,
                                          global_pallas_available)
from tests.test_pallas_extend import _mat


@pytest.mark.skipif(not global_pallas_available(), reason="no pallas")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_global_parity(monkeypatch, seed):
    monkeypatch.setenv("BWAMEM_TPU_PALLAS_GLOBAL", "0")  # ref = XLA
    B, LQ, LT = 16, 32, 48
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, size=(B, LQ)).astype(np.int8)
    t = rng.integers(0, 4, size=(B, LT)).astype(np.int8)
    for b in range(0, B, 2):     # near-matching lanes
        t[b, :LQ] = q[b, :LQ]
        t[b, rng.integers(0, LQ, size=3)] = 3 - t[b, 0]
    qlen = rng.integers(1, LQ + 1, size=B).astype(np.int32)
    tlen = rng.integers(1, LT + 1, size=B).astype(np.int32)
    w = rng.integers(1, 60, size=B).astype(np.int32)
    mat = _mat()

    ref = ksw.ksw_global2_batched(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(mat), 6, 1, 6, 1,
        jnp.asarray(w), LQ=LQ, LT=LT)
    pal = global_pallas(
        jnp.asarray(q).astype(jnp.int32),
        jnp.asarray(t).astype(jnp.int32), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(mat), 6, 1, 6, 1,
        jnp.asarray(w).astype(jnp.int32), LQ, LT)

    r_sc, r_ops, r_n, r_i, r_k = [np.asarray(x) for x in ref]
    p_sc, p_ops, p_n, p_i, p_k = [np.asarray(x) for x in pal]
    np.testing.assert_array_equal(r_sc, p_sc, err_msg="score")
    np.testing.assert_array_equal(r_n, p_n, err_msg="n_ops")
    np.testing.assert_array_equal(r_i, p_i, err_msg="rem_i")
    np.testing.assert_array_equal(r_k, p_k, err_msg="rem_k")
    for b in range(B):
        np.testing.assert_array_equal(
            r_ops[b, :r_n[b]], p_ops[b, :p_n[b]], err_msg=f"ops[{b}]")
