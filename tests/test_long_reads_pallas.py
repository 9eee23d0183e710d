"""Mosaic SMEM kernels at the L=256 lane width (interpret mode):
parity vs the XLA twin incl. exact full-length 256 bp matches — the
qe==256 value that wires as 0 on the uint8 download wire."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_fm():
    from bwamem_tpu.index.fmindex import FmIndex
    rng = np.random.default_rng(29)
    fwd = rng.integers(0, 4, 4000).astype(np.uint8)
    return fwd, FmIndex.build(np.concatenate([fwd, 3 - fwd[::-1]]))


def test_superstep_pallas_256_matches_xla(small_fm):
    from bwamem_tpu.ops.smem import smem_superstep
    from bwamem_tpu.ops.fm import DeviceFmIndex
    fwd, fm = small_fm
    rng = np.random.default_rng(43)
    B, L, M = 128, 256, 16
    d = DeviceFmIndex.from_host(fm)
    q = np.full((B, L), 4, np.int8)
    qlen = np.zeros(B, np.int32)
    for i in range(B):
        n = 256 if i < 8 else int(rng.integers(129, 257))
        off = int(rng.integers(0, len(fwd) - n))
        q[i, :n] = fwd[off:off + n]
        if i >= 8 and rng.random() < 0.5:
            for _ in range(int(rng.integers(1, 4))):
                q[i, int(rng.integers(0, n))] = int(rng.integers(0, 5))
        qlen[i] = n
    act = np.ones(B, bool)
    act[B - 1] = False
    q8 = jnp.asarray(q)
    qlj = jnp.asarray(qlen)
    mi = jnp.ones(B, d.L2.dtype)
    slens = jnp.full(B, 29, jnp.int32)
    swid = jnp.full(B, 10, jnp.int32)
    kw = dict(L=L, M=M, OUT_CAP=48, NEED_X1=True)
    ref = smem_superstep(d.blocks, d.primary, d.L2, q8, qlj, mi,
                         jnp.asarray(act), slens, swid, PALLAS=False,
                         **kw)
    os.environ["BWAMEM_TPU_PALLAS_SMEM"] = "force"
    try:
        out = smem_superstep(d.blocks, d.primary, d.L2, q8, qlj, mi,
                             jnp.asarray(act), slens, swid, PALLAS=True,
                             **kw)
    finally:
        os.environ.pop("BWAMEM_TPU_PALLAS_SMEM", None)
    for name, a, b in zip(["o0", "o1", "os", "oqb", "oqe", "n", "over"],
                          ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, np.int64), np.asarray(b, np.int64),
            err_msg=f"superstep field {name} diverged at L=256")
    # the full-length lanes must carry a qe==256 interval on the wire
    # (uint8-wrapped to 0) — make sure the case actually occurred
    oqe, n_out = np.asarray(ref[4]), np.asarray(ref[5])
    wrapped = [(oqe[i, :n_out[i]] == 0).any()
               for i in range(8) if n_out[i]]
    assert any(wrapped), "no qe==256 interval reached the wire"
