"""Parity: the Pallas SMEM kernel (interpret mode on CPU) must match
the XLA _smem1_impl exactly — including padding values — across edge
cases: ambiguous bases, mid-read starts, min_intv > 1, inactive lanes,
short reads, and forced interval-buffer overflow."""

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
        if rng.random() < 0.3:  # mismatches
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


@pytest.mark.parametrize("amb,mid,widths", [
    (False, False, False),
    (True, False, False),
    (False, True, True),
    (True, True, True),
])
def test_smem1_pallas_matches_xla(small_fm, amb, mid, widths):
    from bwamem_tpu.ops.smem import _smem1_impl
    from bwamem_tpu.ops import pallas_smem as psm
    fwd, fm = small_fm
    rng = np.random.default_rng(hash((amb, mid, widths)) % 2**31)
    B, L, M = 128, 128, 16
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, amb, mid,
                                          widths)
    ref = _smem1_impl(d.blocks, d.primary, d.L2, q, qlen, x, mi, act,
                      L, M, 0)
    tbl = psm.prep_table(d.blocks)
    out = psm.smem1_pallas(tbl, d.primary, d.L2, q, qlen, x,
                           mi.astype(jnp.int32), act, L, M,
                           interpret=True)
    names = ["ret", "n_mem", "m0", "m1", "ms", "mqb", "mqe"]
    # XLA tuple order: ret, n_mem, m0, m1, ms, mqb, mqe, overflow
    for name, a, b in zip(names + ["overflow"], ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64),
            err_msg=f"field {name} diverged")


def test_smem1_pallas_overflow_flag(small_fm):
    """M=2 forces interval-buffer overflow on most lanes; the overflow
    mask must match the XLA impl exactly."""
    from bwamem_tpu.ops.smem import _smem1_impl
    from bwamem_tpu.ops import pallas_smem as psm
    fwd, fm = small_fm
    rng = np.random.default_rng(5)
    B, L, M = 128, 128, 2
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, True,
                                          False, True)
    ref = _smem1_impl(d.blocks, d.primary, d.L2, q, qlen, x, mi, act,
                      L, M, 0)
    tbl = psm.prep_table(d.blocks)
    out = psm.smem1_pallas(tbl, d.primary, d.L2, q, qlen, x,
                           mi.astype(jnp.int32), act, L, M,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ref[7]), np.asarray(out[7]))
    assert np.asarray(out[7]).any()


def test_superstep_pallas_matches_xla(small_fm):
    """smem_superstep PALLAS=True (interpret) == PALLAS=False on the
    full iterator: output streams, counts and overflow must be
    identical."""
    import os
    from bwamem_tpu.ops import pallas_smem as psm
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
    os.environ["BWAMEM_TPU_PALLAS_SMEM"] = "force"
    try:
        out = smem_superstep(d.blocks, d.primary, d.L2, q8, qlen, mi,
                             act, slens, swid, PALLAS=True, **kw)
    finally:
        os.environ.pop("BWAMEM_TPU_PALLAS_SMEM", None)
    for name, a, b in zip(["o0", "o1", "os", "oqb", "oqe", "n", "over"],
                          ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, np.int64), np.asarray(b, np.int64),
            err_msg=f"superstep field {name} diverged")


def test_sa_lookup_pallas_matches_xla(small_fm):
    """The Mosaic inverse-Psi walk (interpret mode) must match
    fm.sa_lookup_batched exactly, including overflow lanes and the
    k == primary edge."""
    from bwamem_tpu.ops.fm import DeviceFmIndex, sa_lookup_batched
    from bwamem_tpu.ops import pallas_smem as psm
    fwd, fm = small_fm
    d = DeviceFmIndex.from_host(fm)
    rng = np.random.default_rng(23)
    B = 256
    ks = rng.integers(0, int(fm.seq_len), B).astype(np.int64)
    ks[0] = int(np.asarray(d.primary))
    ks[1] = 0
    kj = jnp.asarray(ks.astype(np.int32))
    for max_steps in (1024, 3):  # 3 forces overflow lanes
        ref_v, ref_o = sa_lookup_batched(
            d.blocks, d.primary, d.L2, d.seq_len, d.sa, d.sa_intv, kj,
            max_steps=max_steps)
        tbl = psm.prep_table(d.blocks)
        sap = psm.prep_sa_table(d.sa)
        v, o = psm.sa_lookup_pallas(tbl, sap, d.primary, d.L2,
                                    d.seq_len, d.sa_intv, kj,
                                    max_steps=max_steps, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref_o), np.asarray(o))
        np.testing.assert_array_equal(
            np.asarray(ref_v, np.int64), np.asarray(v, np.int64))
    assert np.asarray(o).any()  # the 3-step cap did overflow some lane


def test_smem1_pallas_slabbed_gather(small_fm, monkeypatch):
    """Slab-chunked one-hot gathers (tables wider than the VMEM slab
    budget) must be value-identical to the single-matmul path."""
    from bwamem_tpu.ops.smem import _smem1_impl
    from bwamem_tpu.ops import pallas_smem as psm
    fwd, fm = small_fm
    rng = np.random.default_rng(31)
    B, L, M = 128, 128, 16
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, True,
                                          True, True)
    ref = _smem1_impl(d.blocks, d.primary, d.L2, q, qlen, x, mi, act,
                      L, M, 0)
    # force slabbing: 3000bp genome -> 47 blocks -> NBP 128; budget of
    # 128*C/4 elements forces 4+ slabs... NBP=128 can't slab below 128,
    # so shrink the budget to split a padded 256-wide table instead
    monkeypatch.setattr(psm, "_OH_ELEMS", 128 * 64)
    tbl = psm.prep_table(d.blocks)
    tbl = jnp.concatenate(
        [tbl, jnp.zeros((48, 256 - tbl.shape[1]), tbl.dtype)], axis=1) \
        if tbl.shape[1] < 256 else tbl
    out = psm.smem1_pallas(tbl, d.primary, d.L2, q, qlen, x,
                           mi.astype(jnp.int32), act, L, M,
                           interpret=True)
    for name, a, b in zip(
            ["ret", "n_mem", "m0", "m1", "ms", "mqb", "mqe", "over"],
            ref, out):
        np.testing.assert_array_equal(
            np.asarray(a, np.int64), np.asarray(b, np.int64),
            err_msg=f"slabbed field {name} diverged")


def test_superstep_gcap_compaction(small_fm):
    """GCAP compact wire == dense wire streams; lanes spilling past a
    tiny GCAP must flag overflow with zeroed counts."""
    from bwamem_tpu.ops.smem import smem_superstep
    fwd, fm = small_fm
    rng = np.random.default_rng(41)
    B, L, M = 64, 64, 16
    d, (q, qlen, x, mi, act) = _case_args(fwd, fm, B, L, rng, False,
                                          False, False)
    q8 = jnp.asarray(np.asarray(q, np.int8))
    slens = jnp.full(B, 29, jnp.int32)
    swid = jnp.full(B, 10, jnp.int32)
    kw = dict(L=L, M=M, OUT_CAP=48, PALLAS=False)
    o0, o1, os_, oqb, oqe, n, over = smem_superstep(
        d.blocks, d.primary, d.L2, q8, qlen, mi, act, slens, swid,
        NEED_X1=True, **kw)
    n_np = np.where(np.asarray(over), 0, np.asarray(n, np.int64))
    mask = np.arange(48)[None, :] < n_np[:, None]
    want = [np.asarray(a)[mask] for a in (o0, o1, os_, oqb, oqe)]

    c0, c1, cs, cqb, cqe, cn, cover = smem_superstep(
        d.blocks, d.primary, d.L2, q8, qlen, mi, act, slens, swid,
        NEED_X1=True, GCAP=B * 12, **kw)
    assert np.array_equal(np.asarray(cover), np.asarray(over))
    np.testing.assert_array_equal(np.asarray(cn), n_np)
    tot = int(n_np.sum())
    for name, w, c in zip("01sbe", want, (c0, c1, cs, cqb, cqe)):
        np.testing.assert_array_equal(
            np.asarray(c, np.int64)[:tot], w.astype(np.int64),
            err_msg=f"compact stream {name} diverged")

    # tiny GCAP: later lanes spill -> flagged over, counts zeroed, and
    # the surviving prefix still matches the dense streams
    g = max(8, tot // 3)
    s0, s1, ss, sqb, sqe, sn, sov = smem_superstep(
        d.blocks, d.primary, d.L2, q8, qlen, mi, act, slens, swid,
        NEED_X1=True, GCAP=g, **kw)
    sov, sn = np.asarray(sov), np.asarray(sn, np.int64)
    assert sov.sum() > np.asarray(over).sum()
    assert (sn[sov] == 0).all()
    keep = int(sn.sum())
    assert keep <= g
    base = np.cumsum(n_np) - n_np
    lane_keep = ~sov
    want0 = np.asarray(o0)[np.arange(48)[None, :]
                           < np.where(lane_keep, n_np, 0)[:, None]]
    np.testing.assert_array_equal(np.asarray(s0, np.int64)[:keep],
                                  want0.astype(np.int64))


def test_fused_sa_matches_split(small_fm, monkeypatch):
    """interval_arrays + seeds_from_arrays with the fused superstep+SA
    dispatch must produce exactly the split path's seeds."""
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

    def run(fuse):
        monkeypatch.setattr(sd, "FUSE_SA", fuse)
        s = sd.BatchedSeeder(d, max_len=128, sa_max_steps=1024,
                             fm_host=fm)
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
            err_msg=f"fused-SA seeds field {name} diverged")
    assert len(seeds_b[0]) > 0


def test_fused_sa_salvage_with_overflow(small_fm, monkeypatch):
    """Buffer-overflow lanes splice in oracle streams; the fused-SA
    prefetch must survive for the CLEAN lanes (dev_mark salvage) and
    still produce exactly the split path's seeds."""
    import bwamem_tpu.ops.seeding as sd
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.config import MemOptions
    fwd, fm = small_fm
    d = DeviceFmIndex.from_host(fm)
    opt = MemOptions()
    rng = np.random.default_rng(71)
    queries = []
    for i in range(48):
        n = int(rng.integers(60, 101))
        off = int(rng.integers(0, len(fwd) - n))
        q = fwd[off:off + n].copy()
        if i % 5 == 0:  # low-complexity: many live intervals -> M=4
            q = np.tile(fwd[off:off + 8], 12)[:n].copy()
        queries.append(q)

    def run(fuse):
        monkeypatch.setattr(sd, "FUSE_SA", fuse)
        s = sd.BatchedSeeder(d, max_len=128, sa_max_steps=1024,
                             fm_host=fm)
        s.M = 4  # force interval-buffer overflow on the repetitive reads
        n_oracle = [0]
        orig = s._oracle_finish

        def of(*a, **k):
            n_oracle[0] += 1
            return orig(*a, **k)
        s._oracle_finish = of
        iv = s.interval_arrays(opt, queries)
        pre = s._sa_prefetch
        seeds = s.seeds_from_arrays(fm, iv, opt)
        return iv, seeds, n_oracle[0], pre

    iv_a, seeds_a, n_ora_a, _ = run(False)
    iv_b, seeds_b, n_ora_b, pre_b = run(True)
    assert n_ora_b > 0, "no overflow lanes: the salvage path never ran"
    assert pre_b is not None, "prefetch was dropped despite salvage"
    assert not pre_b[3].all(), "expected oracle-spliced intervals"
    for x, y in zip(iv_a, iv_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for name, x, y in zip(["rid", "rbeg", "qb", "len"], seeds_a,
                          seeds_b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=f"salvaged fused-SA seeds field {name} diverged")
