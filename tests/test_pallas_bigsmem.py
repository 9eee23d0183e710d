"""Parity: the HBM-resident DMA-wave SMEM kernels (interpret mode on
CPU) must match the XLA implementations exactly — the same contract as
tests/test_pallas_smem.py, with the big-table gather swapped in.  The
kernels share the full iterator machinery with ops.pallas_smem via the
gather_factory hooks, so these tests pin down exactly the new parts:
the wide-row table layout, the index bounce, the DMA wave, and the
block-within-row selection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_fm():
    from bwamem_tpu.index.fmindex import FmIndex
    rng = np.random.default_rng(11)
    fwd = rng.integers(0, 4, 3000).astype(np.uint8)
    return fwd, FmIndex.build(np.concatenate([fwd, 3 - fwd[::-1]]))


def _case_args(fwd, fm, B, L, rng, amb=False, mid=False, widths=False):
    from bwamem_tpu.ops.fm import DeviceFmIndex
    d = DeviceFmIndex.from_host(fm)
    q = np.full((B, L), 4, dtype=np.int8)
    qlen = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(21, L + 1))
        off = int(rng.integers(0, len(fwd) - n))
        q[i, :n] = fwd[off:off + n]
        if rng.random() < 0.3:
            for _ in range(int(rng.integers(1, 4))):
                q[i, int(rng.integers(0, n))] = int(rng.integers(0, 4))
        if amb and rng.random() < 0.5:
            q[i, int(rng.integers(0, n))] = 4
        qlen[i] = n
    x = np.zeros(B, np.int32)
    if mid:
        x = (rng.integers(0, qlen)).astype(np.int32)
    mi = np.ones(B, np.int64)
    if widths:
        mi = rng.integers(1, 12, B).astype(np.int64)
    act = np.ones(B, bool)
    act[B - 1] = False
    return d, (jnp.asarray(q.astype(np.int32)), jnp.asarray(qlen),
               jnp.asarray(x), jnp.asarray(mi), jnp.asarray(act))


def test_prep_table_wide_layout(small_fm):
    """Wide rows must be exactly 8 consecutive 16-word blocks."""
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    _, fm = small_fm
    d = DeviceFmIndex.from_host(fm)
    w = np.asarray(jax.jit(pbig.prep_table_wide)(d.blocks))
    nb = d.blocks.shape[0]
    flat = np.asarray(d.blocks).astype(np.uint32).reshape(-1)
    got = w.astype(np.uint32).reshape(-1)[:nb * 16]
    np.testing.assert_array_equal(got, flat)
    assert w.shape[1] == 128 and w.dtype == np.int32


@pytest.mark.parametrize("amb,mid,widths", [
    (False, False, False),
    (True, True, True),
])
def test_smem1_big_matches_xla(small_fm, amb, mid, widths):
    from bwamem_tpu.ops.smem import _smem1_impl
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    fwd, fm = small_fm
    rng = np.random.default_rng(hash((amb, mid, widths)) % 2**31)
    B, L, M = 128, 128, 16
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, amb, mid,
                                          widths)
    ref = _smem1_impl(d.blocks, d.primary, d.L2, q, qlen, x, mi, act,
                      L, M, 0)
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    out = pbig.smem1_pallas_big(tblw, d.primary, d.L2, q, qlen, x,
                                mi.astype(jnp.int32), act, L, M,
                                interpret=True)
    names = ["ret", "n_mem", "m0", "m1", "ms", "mqb", "mqe", "overflow"]
    for name, a, b in zip(names, ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64),
            err_msg=f"field {name} diverged")


def test_superstep_big_matches_xla(small_fm):
    import os
    from bwamem_tpu.ops.smem import smem_superstep
    fwd, fm = small_fm
    rng = np.random.default_rng(17)
    B, L, M = 64, 64, 16
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, True,
                                          False, False)
    q8 = jnp.asarray(np.asarray(q, np.int8))
    slens = jnp.full(B, 29, jnp.int32)
    swid = jnp.full(B, 10, jnp.int32)
    kw = dict(L=L, M=M, OUT_CAP=48, NEED_X1=True)
    ref = smem_superstep(d.blocks, d.primary, d.L2, q8, qlen, mi, act,
                         slens, swid, PALLAS=False, **kw)
    os.environ["BWAMEM_TPU_PALLAS_BIGSMEM"] = "force"
    try:
        out = smem_superstep(d.blocks, d.primary, d.L2, q8, qlen, mi,
                             act, slens, swid, PALLAS="big", **kw)
    finally:
        os.environ.pop("BWAMEM_TPU_PALLAS_BIGSMEM", None)
    for name, a, b in zip(["o0", "o1", "os", "oqb", "oqe", "n", "over"],
                          ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, np.int64), np.asarray(b, np.int64),
            err_msg=f"big superstep field {name} diverged")


def test_sa_lookup_big_matches_xla(small_fm):
    from bwamem_tpu.ops.fm import DeviceFmIndex, sa_lookup_batched
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    fwd, fm = small_fm
    d = DeviceFmIndex.from_host(fm)
    rng = np.random.default_rng(23)
    B = 256
    ks = rng.integers(0, int(fm.seq_len), B).astype(np.int64)
    ks[0] = int(np.asarray(d.primary))
    ks[1] = 0
    kj = jnp.asarray(ks.astype(np.int32))
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    saw = jax.jit(pbig.prep_sa_wide)(d.sa)
    for max_steps in (1024, 3):
        ref_v, ref_o = sa_lookup_batched(
            d.blocks, d.primary, d.L2, d.seq_len, d.sa, d.sa_intv, kj,
            max_steps=max_steps)
        v, o = pbig.sa_lookup_pallas_big(
            tblw, saw, d.primary, d.L2, d.seq_len, d.sa_intv, kj,
            max_steps=max_steps, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref_o), np.asarray(o))
        np.testing.assert_array_equal(
            np.asarray(ref_v, np.int64), np.asarray(v, np.int64))
    assert np.asarray(o).any()


def test_fused_sa_big_matches_split(small_fm, monkeypatch):
    """The whole fused superstep+SA dispatch with PALLAS='big' must
    produce exactly the XLA split path's intervals and seeds."""
    import os
    import bwamem_tpu.ops.seeding as sd
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.config import MemOptions
    fwd, fm = small_fm
    d = DeviceFmIndex.from_host(fm)
    opt = MemOptions()
    rng = np.random.default_rng(53)
    queries = []
    for i in range(60):
        n = int(rng.integers(40, 101))
        off = int(rng.integers(0, len(fwd) - n))
        q = fwd[off:off + n].copy()
        if rng.random() < 0.4:
            q[int(rng.integers(0, n))] = int(rng.integers(0, 4))
        queries.append(q)

    # the Mosaic gates need 128-lane groups (conftest shrinks to 64)
    monkeypatch.setattr(sd, "LANES", 128)

    def run(force_big):
        if force_big:
            monkeypatch.setenv("BWAMEM_TPU_PALLAS_BIGSMEM", "force")
            # force big mode below the one-hot crossover
            monkeypatch.setattr(sd, "_FORCE_BIG_TEST", True,
                                raising=False)
        else:
            monkeypatch.setattr(sd, "_FORCE_BIG_TEST", False,
                                raising=False)
            monkeypatch.delenv("BWAMEM_TPU_PALLAS_BIGSMEM",
                               raising=False)
        s = sd.BatchedSeeder(d, max_len=128, sa_max_steps=1024,
                             fm_host=fm)
        if force_big:
            assert s.use_pallas_big, "big path not selected"
        iv = s.interval_arrays(opt, queries)
        seeds = s.seeds_from_arrays(fm, iv, opt)
        return iv, seeds

    iv_a, seeds_a = run(False)
    iv_b, seeds_b = run(True)
    for x, y in zip(iv_a, iv_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for name, x, y in zip(["rid", "rbeg", "qb", "len"], seeds_a,
                          seeds_b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=f"big fused-SA seeds field {name} diverged")
    assert len(seeds_b[0]) > 0


def test_smem1_big_dedup_matches_xla(small_fm, monkeypatch):
    """BWAMEM_TPU_BIG_DEDUP=1 skips second-half (l-side) DMAs whose row
    matches the paired k-side lane and repairs by lane roll — results
    must be identical (the bwt_2occ4 same-block fusion,
    software/bwt.c:217-242, at 512 B row granularity)."""
    from bwamem_tpu.ops.smem import _smem1_impl
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    monkeypatch.setenv("BWAMEM_TPU_BIG_DEDUP", "1")
    fwd, fm = small_fm
    rng = np.random.default_rng(29)
    B, L, M = 128, 128, 16
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, True,
                                          True, True)
    ref = _smem1_impl(d.blocks, d.primary, d.L2, q, qlen, x, mi, act,
                      L, M, 0)
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    out = pbig.smem1_pallas_big(tblw, d.primary, d.L2, q, qlen, x,
                                mi.astype(jnp.int32), act, L, M,
                                interpret=True)
    names = ["ret", "n_mem", "m0", "m1", "ms", "mqb", "mqe", "overflow"]
    for name, a, b in zip(names, ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64),
            err_msg=f"dedup field {name} diverged")


def test_superstep_big_L512(small_fm, monkeypatch):
    """The 512 bp long-fragment bucket: radix-1024 merge key + int32
    qb/qe wire.  300-500 bp queries through the DMA superstep must
    match the XLA twin exactly."""
    from bwamem_tpu.ops.smem import smem_superstep
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    monkeypatch.setenv("BWAMEM_TPU_PALLAS_BIGSMEM", "force")
    fwd, fm = small_fm
    from bwamem_tpu.ops.fm import DeviceFmIndex
    d = DeviceFmIndex.from_host(fm)
    rng = np.random.default_rng(37)
    B, L, M, OC = 128, 512, 16, 64
    q = np.full((B, L), 4, dtype=np.int8)
    qlen = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(280, L + 1))
        off = int(rng.integers(0, len(fwd) - n))
        q[i, :n] = fwd[off:off + n]
        for _ in range(int(rng.integers(0, 6))):
            q[i, int(rng.integers(0, n))] = int(rng.integers(0, 5))
        qlen[i] = n
    act = np.ones(B, bool)
    act[B - 1] = False
    q8 = jnp.asarray(q)
    args = (q8, jnp.asarray(qlen), jnp.full(B, 1, jnp.int64),
            jnp.asarray(act), jnp.minimum(jnp.asarray(qlen), 28),
            jnp.full(B, 10, jnp.int32))
    kw = dict(L=L, M=M, OUT_CAP=OC, NEED_X1=True)
    ref = smem_superstep(d.blocks, d.primary, d.L2, *args,
                         PALLAS=False, **kw)
    out = smem_superstep(d.blocks, d.primary, d.L2, *args,
                         PALLAS="big", **kw)
    n_ref = np.asarray(ref[5])
    np.testing.assert_array_equal(np.asarray(out[5]), n_ref)
    np.testing.assert_array_equal(np.asarray(out[6]), np.asarray(ref[6]))
    valid = (np.arange(OC)[None, :] < n_ref[:, None]) \
        & ~np.asarray(ref[6])[:, None]
    for name, a, b in zip(["o0", "o1", "os", "oqb", "oqe"],
                          out[:5], ref[:5]):
        av = np.where(valid, np.asarray(a, np.int64), 0)
        bv = np.where(valid, np.asarray(b, np.int64), 0)
        np.testing.assert_array_equal(av, bv, err_msg=name)
    assert np.asarray(ref[3]).dtype == np.int32  # int32 wire past 256


@pytest.mark.parametrize("halves", [2, 4])
def test_superstep_big_dual_matches_xla(small_fm, monkeypatch, halves):
    """The multi-half wave-interleaved kernel (H independent 128-lane
    halves per instance, concurrent DMA waves) must be byte-identical
    to the XLA superstep — same contract as the single-half kernel."""
    from bwamem_tpu.ops.smem import smem_superstep
    fwd, fm = small_fm
    rng = np.random.default_rng(31)
    B, L, M = 128 * halves, 128, 16
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, True,
                                          False, True)
    q8 = jnp.asarray(np.asarray(q, np.int8))
    slens = jnp.full(B, 29, jnp.int32)
    swid = jnp.full(B, 10, jnp.int32)
    kw = dict(L=L, M=M, OUT_CAP=48, NEED_X1=True)
    ref = smem_superstep(d.blocks, d.primary, d.L2, q8, qlen, mi, act,
                         slens, swid, PALLAS=False, **kw)
    monkeypatch.setenv("BWAMEM_TPU_PALLAS_BIGSMEM", "force")
    monkeypatch.setenv("BWAMEM_TPU_BIG_HALVES", str(halves))
    out = smem_superstep(d.blocks, d.primary, d.L2, q8, qlen, mi,
                         act, slens, swid, PALLAS="big", **kw)
    for name, a, b in zip(["o0", "o1", "os", "oqb", "oqe", "n", "over"],
                          ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, np.int64), np.asarray(b, np.int64),
            err_msg=f"dual({halves}) superstep field {name} diverged")
