"""Parity: the on-device extension-row builder (interpret mode) must
reproduce the native packer's rows byte-for-byte, and the full on-chip
extend_lr must match ksw_extend_lr_batched exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def packed_case(data_dir):
    import os
    from bwamem_tpu.index import load_index
    from bwamem_tpu.io.fastq import ChunkReader
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.core.pipeline import encode_read
    from bwamem_tpu.core.chain import mem_chain
    from bwamem_tpu.core.nfinalize import pack_extlr_native
    fm, bns = load_index(os.path.join(data_dir, "genome.fa"))
    reads = ChunkReader(os.path.join(data_dir, "reads_se.fq")) \
        .read_chunk(1 << 30)[:64]
    opt = MemOptions()
    for r in reads:
        encode_read(r)
    l_pac = bns.l_pac
    # flat chains via the host path
    chain_off = [0]
    seed_off = [0]
    s_rb, s_qb, s_ln = [], [], []
    for r in reads:
        chains = mem_chain(opt, fm, l_pac, r.seq_nt4)
        for c in chains:
            for (rb, qb, ln) in c.seeds:
                s_rb.append(rb)
                s_qb.append(qb)
                s_ln.append(ln)
            seed_off.append(len(s_rb))
        chain_off.append(len(seed_off) - 1)
    flat = (np.asarray(chain_off, np.int64), np.asarray(seed_off, np.int64),
            np.asarray(s_rb, np.int64), np.asarray(s_qb, np.int32),
            np.asarray(s_ln, np.int32))
    LQ, LT = 128, 544
    pk = pack_extlr_native(opt, l_pac, bns.pac, reads, flat, LQ, LT)
    if pk is None:
        pytest.skip("native library unavailable")
    return fm, bns, reads, opt, flat, pk, LQ, LT


def _unpack4(p, L):
    lo = p.astype(np.uint8) & 0xF
    hi = (p.astype(np.uint8) >> 4) & 0xF
    out = np.empty((p.shape[0], L), np.uint8)
    out[:, 0::2] = lo
    out[:, 1::2] = hi
    return out


def _scalars(reads, flat, pk, pad_to):
    chain_off, seed_off, s_rb, s_qb, s_ln = flat
    counts = np.diff(chain_off)
    chain_read = np.repeat(np.arange(len(reads), dtype=np.int32), counts)
    rid = np.repeat(chain_read, np.diff(seed_off))
    dev = np.nonzero(pk["served"] == 0)[0]
    B = pad_to

    def pad(a, fill=0, dt=np.int32):
        out = np.full(B, fill, dt)
        out[:len(dev)] = a[dev]
        return jnp.asarray(out)
    rmax1 = pk["srb"] + pk["slv"] + pk["rlt"]
    return dev, dict(
        rid=pad(rid), qb0=pad(pk["sqb"]), slen=pad(pk["slv"], 1),
        rb0=pad(pk["srb"].astype(np.int64)),
        rmax0=pad(pk["rmax0"].astype(np.int64)),
        rmax1=pad(rmax1.astype(np.int64)),
        lquery=pad(pk["lqv"], 1),
        llq=pad(pk["llq"]), llt=pad(pk["llt"]),
        rlq=pad(pk["rlq"]), rlt=pad(pk["rlt"]),
        sc_seed=pad(pk["scs"]),
        s_rbeg64=jnp.asarray(np.where(
            np.arange(B) < len(dev),
            np.concatenate([pk["srb"][dev],
                            np.zeros(B - len(dev), np.int64)]),
            0)),
        rmax0_64=jnp.asarray(np.where(
            np.arange(B) < len(dev),
            np.concatenate([pk["rmax0"][dev],
                            np.zeros(B - len(dev), np.int64)]), 0)),
    )


def _qmat(reads, LQ):
    q = np.full((LQ, len(reads)), 4, np.int8)
    for i, r in enumerate(reads):
        q[:len(r.seq_nt4), i] = r.seq_nt4
    nrp = -(-len(reads) // 128) * 128
    if nrp != len(reads):
        q = np.concatenate([q, np.full((LQ, nrp - len(reads)), 4,
                                       np.int8)], axis=1)
    return jnp.asarray(q)


def test_built_rows_match_native_pack(packed_case):
    from bwamem_tpu.ops import pallas_extbuild as pe
    fm, bns, reads, opt, flat, pk, LQ, LT = packed_case
    B = 128
    dev, sc = _scalars(reads, flat, pk, B)
    assert len(dev) > 0
    qmat = _qmat(reads, LQ).astype(jnp.bfloat16)
    pacp = jnp.asarray(pe.prep_pac_planes(bns.pac), jnp.bfloat16)
    lqT, ltT, rqT, rtT = pe.build_rows_pallas(
        qmat, pacp, jnp.asarray(np.int32(bns.l_pac)),
        sc["rid"], sc["qb0"], sc["slen"],
        sc["rb0"].astype(jnp.int32), sc["rmax0"].astype(jnp.int32),
        sc["rmax1"].astype(jnp.int32), sc["lquery"], LQ, LT,
        interpret=True)
    got = dict(lq=np.asarray(lqT).T, lt=np.asarray(ltT).T,
               rq=np.asarray(rqT).T, rt=np.asarray(rtT).T)
    want = dict(lq=_unpack4(pk["lq_pk"][dev], LQ),
                lt=_unpack4(pk["lt_pk"][dev], LT),
                rq=_unpack4(pk["rq_pk"][dev], LQ),
                rt=_unpack4(pk["rt_pk"][dev], LT))
    for k in ("lq", "lt", "rq", "rt"):
        np.testing.assert_array_equal(
            got[k][:len(dev)].astype(np.uint8), want[k],
            err_msg=f"{k} rows diverged")


def test_extend_lr_onchip_matches_batched(packed_case):
    import os
    from bwamem_tpu.ops import pallas_extbuild as pe
    from bwamem_tpu.ops.ksw import ksw_extend_lr_batched
    fm, bns, reads, opt, flat, pk, LQ, LT = packed_case
    B = 128
    dev, sc = _scalars(reads, flat, pk, B)
    mat = jnp.asarray(np.asarray(opt.mat, np.int32))

    def pack_rows(key, width):
        buf = np.full((B, width >> 1), 0x44, np.int8)
        buf[:len(dev)] = pk[key][dev][:, :width >> 1]
        return jnp.asarray(buf)

    ref = ksw_extend_lr_batched(
        pack_rows("lq_pk", LQ), pack_rows("lt_pk", LT),
        sc["llq"], sc["llt"], pack_rows("rq_pk", LQ),
        pack_rows("rt_pk", LT), sc["rlq"], sc["rlt"], mat,
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.w,
        opt.pen_clip5, opt.pen_clip3, opt.zdrop,
        sc["sc_seed"], sc["qb0"], sc["s_rbeg64"], sc["rmax0_64"],
        sc["lquery"], sc["slen"], LQ=LQ, LT=LT, packed=True)

    os.environ["BWAMEM_TPU_ONCHIP_EXT"] = "force"  # default-off: opt in
    os.environ["BWAMEM_TPU_PALLAS_EXTEND"] = "1"  # interpret-mode DP
    try:
        qmat = _qmat(reads, LQ)
        pacp = jnp.asarray(pe.prep_pac_planes(bns.pac), jnp.bfloat16)
        out = pe.extend_lr_onchip(
            qmat, pacp, jnp.asarray(np.int32(bns.l_pac)),
            sc["rid"], sc["qb0"], sc["slen"],
            sc["rb0"].astype(jnp.int32), sc["rmax0"].astype(jnp.int32),
            sc["rmax1"].astype(jnp.int32), sc["lquery"],
            sc["llq"], sc["llt"], sc["rlq"], sc["rlt"], sc["sc_seed"],
            sc["s_rbeg64"], sc["rmax0_64"], mat,
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.w,
            opt.pen_clip5, opt.pen_clip3, opt.zdrop, LQ=LQ, LT=LT)
    finally:
        os.environ.pop("BWAMEM_TPU_ONCHIP_EXT", None)
        os.environ.pop("BWAMEM_TPU_PALLAS_EXTEND", None)
    for name, a, b in zip(
            ["score", "truesc", "qb", "rb", "qe", "re", "aw0", "aw1"],
            ref, out):
        np.testing.assert_array_equal(
            np.asarray(a)[:len(dev)], np.asarray(b)[:len(dev)],
            err_msg=f"field {name} diverged")
