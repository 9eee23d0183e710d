"""Parity for the WIDE (int64-genome) DMA-wave kernels.

The reference's canonical workload is a 3 GB BWT whose doubled pack
exceeds 2^31 (human_g1k_v37; software/bwa.c:286-301) — coordinates no
longer fit int32, so the Mosaic kernels carry them as radix-2^30
(hi, lo) int32 plane pairs (ops/pallas_smem.py _CW).  Coverage here:

1. the _CW plane arithmetic fuzzed directly against int64 (hi-plane
   carries/borrows never trigger on a small-genome kernel run, so they
   need their own fuzz);
2. the wide kernels (interpret mode on CPU) against the XLA int64
   twins on a small genome forced to int64 coordinates
   (BWAMEM_TPU_FORCE_I64, the ops.fm test hook) — this pins the wide
   plumbing end to end: scalar-row packing, paired-plane params, the
   16-word gather with live hi checkpoint words, and output rejoin.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bwamem_tpu.ops.pallas_smem import _CW


# ---------------------------------------------------------------------------
# _CW radix-2^30 arithmetic fuzz
# ---------------------------------------------------------------------------

B30 = 1 << 30


def _split(v):
    return (jnp.asarray((v >> 30).astype(np.int32)),
            jnp.asarray((v & (B30 - 1)).astype(np.int32)))


def _join(t):
    return (np.asarray(t[0]).astype(np.int64) * B30
            + np.asarray(t[1]).astype(np.int64))


def test_cw_arith_fuzz():
    cw = _CW(True)
    rng = np.random.default_rng(5)
    n = 4096
    # values spanning hi == 0, hi carries, and the 3 Gbp regime
    a = rng.integers(0, 1 << 37, n).astype(np.int64)
    b = rng.integers(0, 1 << 37, n).astype(np.int64)
    small = rng.integers(0, 200, n).astype(np.int32)
    # force lo-plane boundary cases
    a[:64] = (a[:64] & ~np.int64(B30 - 1))          # lo == 0
    b[64:128] = (b[64:128] | np.int64(B30 - 1))     # lo == max
    ca, cb = _split(a), _split(b)

    np.testing.assert_array_equal(_join(cw.add(ca, cb)), a + b)
    big = a >= b
    np.testing.assert_array_equal(_join(cw.sub(ca, cb))[big],
                                  (a - b)[big])
    np.testing.assert_array_equal(_join(cw.addi(ca, jnp.asarray(small))),
                                  a + small)
    np.testing.assert_array_equal(_join(cw.subi(ca, jnp.asarray(small))),
                                  a - small)
    np.testing.assert_array_equal(np.asarray(cw.lt(ca, cb)), a < b)
    np.testing.assert_array_equal(np.asarray(cw.le(ca, cb)), a <= b)
    np.testing.assert_array_equal(np.asarray(cw.eq(ca, ca)),
                                  np.ones(n, bool))
    np.testing.assert_array_equal(np.asarray(cw.ne(ca, cb)), a != b)
    np.testing.assert_array_equal(np.asarray(cw.blkrow(ca)),
                                  (a >> 7).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(cw.shr_i32(ca, 5)),
                                  (a >> 5).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(cw.andm(ca, np.int32(127))),
                                  (a & 127).astype(np.int32))
    # subi through zero normalizes to hi == -1 (the k-1 transient)
    z = cw.subi(_split(np.zeros(4, np.int64)), np.int32(1))
    assert _join(z).tolist() == [-1] * 4
    assert not bool(np.asarray(cw.ge0(z)).any())
    # from_ck: 64-bit checkpoint word pairs -> planes
    ck = rng.integers(0, 1 << 37, n).astype(np.int64)
    wlo = jnp.asarray((ck & 0xFFFFFFFF).astype(np.uint32)
                      .view(np.int32))
    whi = jnp.asarray((ck >> 32).astype(np.int32))
    np.testing.assert_array_equal(_join(cw.from_ck(wlo, whi)), ck)
    # max1
    m = np.array([0, 1, 5, B30, -1], np.int64)
    got = _join(cw.max1((jnp.asarray((m >> 30).astype(np.int32)),
                         jnp.asarray((m & (B30 - 1)).astype(np.int32)))))
    np.testing.assert_array_equal(got, np.maximum(m, 1))


# ---------------------------------------------------------------------------
# wide kernels vs XLA int64 twins (small genome forced to int64)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def i64_fm(request):
    from bwamem_tpu.index.fmindex import FmIndex
    rng = np.random.default_rng(31)
    fwd = rng.integers(0, 4, 3000).astype(np.uint8)
    return fwd, FmIndex.build(np.concatenate([fwd, 3 - fwd[::-1]]))


@pytest.fixture()
def dfm64(i64_fm, monkeypatch):
    from bwamem_tpu.ops.fm import DeviceFmIndex
    monkeypatch.setenv("BWAMEM_TPU_FORCE_I64", "1")
    _, fm = i64_fm
    d = DeviceFmIndex.from_host(fm)
    assert d.cdt == jnp.int64
    return d


def _queries(fwd, B, L, rng, frac_amb=0.3):
    q = np.full((B, L), 4, dtype=np.int8)
    qlen = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(21, L + 1))
        off = int(rng.integers(0, len(fwd) - n))
        q[i, :n] = fwd[off:off + n]
        if rng.random() < 0.3:
            for _ in range(int(rng.integers(1, 4))):
                q[i, int(rng.integers(0, n))] = int(rng.integers(0, 4))
        if rng.random() < frac_amb:
            q[i, int(rng.integers(0, n))] = 4
        qlen[i] = n
    return q, qlen


def test_smem1_wide_matches_xla_i64(i64_fm, dfm64):
    from bwamem_tpu.ops.smem import _smem1_impl
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    fwd, _ = i64_fm
    d = dfm64
    rng = np.random.default_rng(41)
    B, L, M = 128, 128, 16
    q, qlen = _queries(fwd, B, L, rng)
    x = (rng.integers(0, qlen)).astype(np.int32)
    mi = rng.integers(1, 12, B).astype(np.int64)
    act = np.ones(B, bool)
    act[B - 1] = False
    q32 = jnp.asarray(q.astype(np.int32))
    ref = _smem1_impl(d.blocks, d.primary, d.L2, q32,
                      jnp.asarray(qlen), jnp.asarray(x),
                      jnp.asarray(mi), jnp.asarray(act), L, M, 0)
    assert ref[2].dtype == jnp.int64
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    out = pbig.smem1_pallas_big(tblw, d.primary, d.L2, q32,
                                jnp.asarray(qlen), jnp.asarray(x),
                                jnp.asarray(mi), jnp.asarray(act),
                                L, M, interpret=True)
    assert out[2].dtype == jnp.int64
    names = ["ret", "n_mem", "m0", "m1", "ms", "mqb", "mqe", "over"]
    for nm, a, b in zip(names, out, ref):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=nm)


def test_superstep_wide_matches_xla_i64(i64_fm, dfm64):
    from bwamem_tpu.ops.smem import smem_superstep
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    fwd, _ = i64_fm
    d = dfm64
    rng = np.random.default_rng(43)
    B, L, M, OC = 128, 128, 16, 48
    q, qlen = _queries(fwd, B, L, rng)
    act = np.ones(B, bool)
    act[B - 1] = False
    slens = np.minimum(28, qlen).astype(np.int32)
    swid = np.full(B, 10, np.int32)
    args = (jnp.asarray(q.astype(np.int32)), jnp.asarray(qlen),
            jnp.full(B, 1, jnp.int64), jnp.asarray(act),
            jnp.asarray(slens), jnp.asarray(swid))
    ref = smem_superstep(d.blocks, d.primary, d.L2, *args,
                         L=L, M=M, OUT_CAP=OC, NEED_X1=True,
                         PALLAS=False)
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    out = pbig.superstep_pallas_big(
        tblw, d.primary, d.L2, args[0], args[1],
        args[2], args[3], args[4], args[5],
        L=L, M=M, OUT_CAP=OC, NEED_X1=True, interpret=True)
    names = ["o0", "o1", "os", "oqb", "oqe", "n_out", "over"]
    n_ref = np.asarray(ref[5])
    n_out = np.asarray(out[5])
    np.testing.assert_array_equal(n_out, n_ref, err_msg="n_out")
    np.testing.assert_array_equal(np.asarray(out[6]),
                                  np.asarray(ref[6]), err_msg="over")
    valid = (np.arange(OC)[None, :] < n_ref[:, None]) \
        & ~np.asarray(ref[6])[:, None]
    for nm, a, b in zip(names[:5], out[:5], ref[:5]):
        av, bv = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(np.where(valid, av, 0),
                                      np.where(valid, bv, 0),
                                      err_msg=nm)
        assert av.dtype == bv.dtype, nm


def test_sa_walk_wide_matches_xla_i64(i64_fm, dfm64):
    from bwamem_tpu.ops.fm import sa_lookup_batched
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    _, fm = i64_fm
    d = dfm64
    rng = np.random.default_rng(47)
    B = 128
    k = rng.integers(0, int(fm.seq_len), B).astype(np.int64)
    ref_v, ref_o = sa_lookup_batched(
        d.blocks, d.primary, d.L2, d.seq_len, d.sa, d.sa_intv,
        jnp.asarray(k), max_steps=128)
    saw = jax.jit(pbig.prep_sa_wide)(d.sa)
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    v, o = pbig.sa_lookup_pallas_big(
        tblw, saw, d.primary, d.L2, d.seq_len, d.sa_intv,
        jnp.asarray(k), max_steps=128, interpret=True)
    assert v.dtype == jnp.int64
    np.testing.assert_array_equal(np.asarray(o), np.asarray(ref_o))
    ok = ~np.asarray(ref_o)
    np.testing.assert_array_equal(np.asarray(v)[ok],
                                  np.asarray(ref_v)[ok])


def test_fused_superstep_sa_wide(i64_fm, dfm64, monkeypatch):
    """The full fused dispatch (superstep + ragged key expansion + SA
    walk) through smem_superstep_sa with PALLAS="big"/SA_PALLAS="big"
    on int64 coordinates — the exact call the seeding path makes at
    3 Gbp scale."""
    from bwamem_tpu.ops.smem import smem_superstep_sa
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    monkeypatch.setenv("BWAMEM_TPU_PALLAS_BIGSMEM", "force")
    fwd, _ = i64_fm
    d = dfm64
    rng = np.random.default_rng(53)
    B, L, M, OC, GCAP = 128, 128, 16, 48, 1024
    q, qlen = _queries(fwd, B, L, rng, frac_amb=0.1)
    act = np.ones(B, bool)
    slens = np.minimum(28, qlen).astype(np.int32)
    qp = q[:, 0::2] | (q[:, 1::2] << np.int8(4))
    common = (jnp.asarray(qp), jnp.asarray(qlen),
              jnp.full(B, 1, jnp.int64), jnp.asarray(act),
              jnp.asarray(slens), jnp.full(B, 10, jnp.int32))
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    saw = jax.jit(pbig.prep_sa_wide)(d.sa)
    kw = dict(min_seed_len=jnp.int32(19), max_occ=jnp.int32(200),
              L=L, M=M, OUT_CAP=OC, QPACKED=True, GCAP=GCAP,
              KEY_CAP=2048, SA_INTV=d.sa_intv, SA_STEPS=128)
    ref = smem_superstep_sa(
        d.blocks, d.primary, d.L2, d.seq_len, d.sa,
        jnp.zeros((1, 8), jnp.bfloat16), jnp.zeros((1, 8), jnp.bfloat16),
        *common, PALLAS=False, SA_PALLAS=False, **kw)
    out = smem_superstep_sa(
        d.blocks, d.primary, d.L2, d.seq_len, d.sa, tblw, saw,
        *common, PALLAS="big", SA_PALLAS="big", **kw)
    # interval stream
    names = ["o0", "o1", "os", "oqb", "oqe", "n", "over"]
    for nm, a, b in zip(names, out[:7], ref[:7]):
        if nm == "o1":
            continue  # NEED_X1=False: placeholder
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)
    # fused SA values
    assert int(out[9]) == int(ref[9])       # n_keys
    assert bool(out[10]) == bool(ref[10])   # kovf
    nk = int(ref[9])
    ro = np.asarray(ref[8])[:nk]
    np.testing.assert_array_equal(np.asarray(out[8])[:nk], ro,
                                  err_msg="sa_over")
    ok = ~ro
    np.testing.assert_array_equal(np.asarray(out[7])[:nk][ok],
                                  np.asarray(ref[7])[:nk][ok],
                                  err_msg="sa_vals")


def test_superstep_wide_dual_matches_xla_i64(i64_fm, dfm64,
                                             monkeypatch):
    """Wide (radix-2^30 paired-plane) superstep through the dual-half
    wave-interleaved kernel: the 3 Gbp regime's exact configuration."""
    from bwamem_tpu.ops.smem import smem_superstep
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    fwd, _ = i64_fm
    d = dfm64
    rng = np.random.default_rng(59)
    B, L, M, OC = 256, 128, 16, 48
    q, qlen = _queries(fwd, B, L, rng)
    act = np.ones(B, bool)
    act[B - 1] = False
    slens = np.minimum(28, qlen).astype(np.int32)
    swid = np.full(B, 10, np.int32)
    args = (jnp.asarray(q.astype(np.int32)), jnp.asarray(qlen),
            jnp.full(B, 1, jnp.int64), jnp.asarray(act),
            jnp.asarray(slens), jnp.asarray(swid))
    ref = smem_superstep(d.blocks, d.primary, d.L2, *args,
                         L=L, M=M, OUT_CAP=OC, NEED_X1=True,
                         PALLAS=False)
    monkeypatch.setenv("BWAMEM_TPU_BIG_HALVES", "2")
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    out = pbig.superstep_pallas_big(
        tblw, d.primary, d.L2, args[0], args[1],
        args[2], args[3], args[4], args[5],
        L=L, M=M, OUT_CAP=OC, NEED_X1=True, interpret=True)
    names = ["o0", "o1", "os", "oqb", "oqe", "n_out", "over"]
    n_ref = np.asarray(ref[5])
    n_out = np.asarray(out[5])
    np.testing.assert_array_equal(n_out, n_ref, err_msg="n_out")
    np.testing.assert_array_equal(np.asarray(out[6]),
                                  np.asarray(ref[6]), err_msg="over")
    valid = (np.arange(OC)[None, :] < n_ref[:, None]) \
        & ~np.asarray(ref[6])[:, None]
    for nm, a, b in zip(names[:5], out[:5], ref[:5]):
        av, bv = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(np.where(valid, av, 0),
                                      np.where(valid, bv, 0),
                                      err_msg=nm)
        assert av.dtype == bv.dtype, nm
