"""Parity: the Pallas local-SW kernel vs the XLA ksw_align row loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwamem_tpu.ops.ksw_align import ksw_align_batched
from bwamem_tpu.ops.pallas_align import (align_pallas,
                                         align_pallas_available)
from tests.test_pallas_extend import _mat


@pytest.mark.skipif(not align_pallas_available(), reason="no pallas")
@pytest.mark.parametrize("size", [1, 2])
@pytest.mark.parametrize("seed", [0, 1])
def test_align_parity(monkeypatch, size, seed):
    monkeypatch.setenv("BWAMEM_TPU_PALLAS_EXTEND", "0")  # ref = XLA
    B, LQV, LT = 16, 48, 96
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, size=(B, LQV)).astype(np.int8)
    t = rng.integers(0, 4, size=(B, LT)).astype(np.int8)
    for b in range(0, B, 2):
        t[b, 5:5 + 40] = q[b, :40]
    qlen = rng.integers(1, LQV + 1, size=B).astype(np.int32)
    tlen = rng.integers(0, LT + 1, size=B).astype(np.int32)
    minsc = np.full(B, 0x10000, np.int32)
    endsc = np.where(rng.random(B) < .3, 20, 0x10000).astype(np.int32)
    mat = _mat()
    ref = ksw_align_batched(jnp.asarray(q), jnp.asarray(t),
                            jnp.asarray(qlen), jnp.asarray(tlen),
                            jnp.asarray(mat), 6, 1, 6, 1,
                            jnp.asarray(minsc), jnp.asarray(endsc),
                            size=size, LQV=LQV, LT=LT)
    shift = np.int32(-mat.min()) if size == 1 else np.int32(0)
    pal = align_pallas(jnp.asarray(q).astype(jnp.int32),
                       jnp.asarray(t).astype(jnp.int32),
                       jnp.asarray(qlen), jnp.asarray(tlen),
                       jnp.asarray(mat), 6, 1, 6, 1,
                       jnp.asarray(endsc), jnp.asarray(shift),
                       size, LQV, LT)
    for nm, a, b in zip(["gmax", "te", "qe", "sat", "row_max", "last"],
                        ref, pal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)
