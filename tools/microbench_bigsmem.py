"""A/B the big-table SMEM paths on a real mid-size index.

    python tools/microbench_bigsmem.py <variant> [B] [reps]

variants: big     superstep_pallas_big (DMA waves)
          xla     XLA smem_superstep (native gather)
          onehot  Mosaic one-hot superstep (past its crossover)
          gw      isolated gather_words pipeline cost at C=256/1024
                  (DMA wave + transpose + sub-block select), T steps
          gwk     K INDEPENDENT wave chains interleaved on K scratch
                  slots (MB_K, MB_C, MB_T): all K waves in flight
                  together, drained in issue order — measures whether
                  concurrent waves overlap (the fwd-pass latency-hiding
                  question).  Compare us/step/chain across MB_K.

Needs /tmp/bigref (tools/make_biggenome.py).  Each timed call uses a
distinct read subset + forced result fetch (np.asarray) — the axon
relay returns repeated identical dispatches anomalously fast.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

DATA = os.environ.get("BWAMEM_TPU_BENCH_DATA", "/tmp/bigref")



def _gwk_one(jax, jnp, lax, np, pbig, tblw, K, C, T, reps):
    """One gwk measurement: K independent C-DMA wave chains, all in
    flight together each step (start 0..K-1, then drain 0..K-1).  The
    next step's row ids depend on the fetched bytes, so a chain is
    latency-bound exactly like the fwd-pass occ fetch."""
    import time
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nrows = int(tblw.shape[0])

    # MB_GWK_MODE: plain = bare start/drain (the proven-overlap form);
    # when  = every start and drain wrapped in pl.when(true-ish guard)
    #         — the fused fwd kernel's guarded-wave structure;
    # cond  = drain+math inside lax.cond(live, ...) — the bwd chunk
    #         structure;
    # prod  = the PRODUCTION gather (pbig._dma_factory start/finish:
    #         arithmetic row shift, index bounce, (C,128)->(128,C)
    #         transpose + 8-way sub-block select) under a while_loop
    #         — the real fwd pass minus the iterator math.
    # A/Bs which structural element serializes otherwise-concurrent
    # waves.
    mode = os.environ.get("MB_GWK_MODE", "plain")
    from jax.experimental import pallas as pl2

    def kernel_prod(seed_ref, tbl_ref, out_ref, *scratch):
        i32 = jnp.int32
        gf = pbig._dma_factory(C, 1)(tbl_ref, scratch)
        gs_start, gs_finish = gf[2]
        nb8 = np.int32(nrows * 8)       # block ids (rowi = blk >> 3)
        st0 = tuple(
            (lax.broadcasted_iota(i32, (1, C), 1) * np.int32(977)
             + seed_ref[0] + np.int32(131 * k)) % nb8
            for k in range(K))

        def step(st):
            t = st[0]
            chains = st[1:]
            for k in range(K):
                gs_start(chains[k], slot=k)
            out = []
            for k in range(K):
                ck, words = gs_finish(chains[k], slot=k)
                dep = jnp.sum(ck[0][0:1] + words[0:1], axis=1,
                              keepdims=True)
                out.append((chains[k] + dep + t) % nb8)
            return (t + np.int32(1),) + tuple(out)

        # MB_GWK_NEST=n: run the chain loop as n nested rounds (the
        # real superstep nests its fwd/bwd whiles inside a round
        # while) — T total steps either way
        nest = int(os.environ.get("MB_GWK_NEST", "1"))

        def rounds(r, carry):
            st = lax.while_loop(
                lambda s: s[0] < np.int32(T // nest), step,
                (np.int32(0),) + carry)
            return st[1:]

        chains = lax.fori_loop(0, nest, rounds, st0) if nest > 1 \
            else rounds(0, st0)
        acc = chains[0]
        for k in range(1, K):
            acc = acc + chains[k]
        out_ref[:, :] = acc + jnp.zeros(out_ref.shape, i32)

    def kernel(seed_ref, tbl_ref, out_ref, *scratch):
        slot_bufs, sems, bsem = pbig._split_scratch(scratch)
        i32 = jnp.int32
        st0 = tuple(
            (lax.broadcasted_iota(i32, (1, C), 1) * np.int32(977)
             + seed_ref[0] + np.int32(131 * k)) % np.int32(nrows)
            for k in range(K))

        def step(t, st):
            live = [jnp.max(st[k]) >= 0 for k in range(K)]
            for k in range(K):
                idxv, idxs, rows = slot_bufs[k]
                if mode == "plain":
                    pbig._wave_start(tbl_ref, idxv, idxs, rows, sems,
                                     bsem, st[k], C, slot=k)
                else:
                    @pl2.when(live[k])
                    def _(k=k, idxv=idxv, idxs=idxs, rows=rows):
                        pbig._wave_start(tbl_ref, idxv, idxs, rows,
                                         sems, bsem, st[k], C, slot=k)
            out = []
            for k in range(K):
                idxv, idxs, rows = slot_bufs[k]

                def dm(k=k, idxv=idxv, idxs=idxs, rows=rows):
                    pbig._wave_drain(tbl_ref, idxv, idxs, rows, sems,
                                     bsem, C, slot=k)

                if mode == "cond":
                    def body(k=k, rows=rows, dm=dm):
                        dm()
                        s2 = jnp.sum(rows[0:C, :], axis=0,
                                     keepdims=True)
                        return jnp.sum(s2, axis=1, keepdims=True) \
                            + jnp.zeros((1, C), i32)
                    s3 = lax.cond(live[k], body,
                                  lambda: jnp.zeros((1, C), i32))
                    out.append((st[k] + s3 + t) % np.int32(nrows))
                    continue
                if mode == "when":
                    pl2.when(live[k])(dm)
                else:
                    dm()
                s2 = jnp.sum(rows[0:C, :], axis=0, keepdims=True)
                s3 = jnp.sum(s2, axis=1, keepdims=True)
                out.append((st[k] + jnp.zeros((1, C), i32) + s3
                            + t) % np.int32(nrows))
            return tuple(out)

        st = lax.fori_loop(0, T, step, st0)
        acc = st[0]
        for k in range(1, K):
            acc = acc + st[k]
        out_ref[:, :] = acc

    kfn = kernel_prod if mode == "prod" else kernel
    # MB_GWK_GRID=G: G grid instances of the chain loop (the real
    # superstep runs B/blk grid steps; tests whether Mosaic's grid
    # machinery serializes user DMA slots).  T steps per instance;
    # the printed us/step divides by T only, so compare per-G.
    G = int(os.environ.get("MB_GWK_GRID", "0"))
    slots = max(2, K) if mode == "prod" else K

    @jax.jit
    def run(seed):
        with jax.enable_x64(False):
            if G:
                return pl.pallas_call(
                    kfn,
                    grid=(G,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec((8, C), lambda b: (b, 0)),
                    out_shape=jax.ShapeDtypeStruct((8 * G, C),
                                                   jnp.int32),
                    scratch_shapes=pbig._scratch_shapes(C, slots=slots),
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True),
                )(seed.reshape(1), tblw)
            return pl.pallas_call(
                kfn,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, C), jnp.int32),
                scratch_shapes=pbig._scratch_shapes(C, slots=slots),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(seed.reshape(1), tblw)

    import numpy as _np
    _np.asarray(run(jnp.int32(0)))
    best = 1e9
    for i in range(reps):
        t0 = time.perf_counter()
        _np.asarray(run(jnp.int32(i + 1)))
        best = min(best, time.perf_counter() - t0)
    print(f"gwk K={K} C={C} T={T}: {best*1e3:.2f} ms/call, "
          f"{best/T*1e6:.2f} us/step, "
          f"{best/T/K*1e6:.2f} us/step/chain")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "big"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp
    from jax import lax
    from bwamem_tpu.index import load_index
    from bwamem_tpu.ops.fm import DeviceFmIndex

    fm, bns = load_index(os.path.join(DATA, "genome.fa"))
    d = DeviceFmIndex.from_host(fm)
    print(f"n_blocks={d.blocks.shape[0]} cdt={d.cdt}", file=sys.stderr)

    if variant == "gw":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from bwamem_tpu.ops import pallas_bigsmem as pbig
        tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
        nb = int(d.blocks.shape[0])
        T = int(os.environ.get("MB_T", "2048"))
        # MB_GW_MODE: full = DMA + transpose + select (production gw);
        # xpose = DMA + transpose; dma = DMA wave only
        mode = os.environ.get("MB_GW_MODE", "full")
        for C in (256, 1024):
            def kernel(seed_ref, tbl_ref, out_ref, idxv, idxs, rows,
                       sems, bsem):
                gw = pbig._dma_factory(C, 1)(
                    tbl_ref, (idxv, idxs, rows, sems, bsem))[0]
                i32 = jnp.int32
                blki = (lax.broadcasted_iota(i32, (1, C), 1) * 977
                        + seed_ref[0]) % np.int32(nb)

                def step(t, bi):
                    if mode == "full":
                        ck, words = gw(bi)   # (ck coord tuple, bwt words)
                        dep = ck[0][0:1] + words[0:1]
                    else:
                        rowi = lax.shift_right_logical(bi, np.int32(3))
                        pbig._wave(tbl_ref, idxv, idxs, rows, sems,
                                   bsem, rowi, C)
                        if mode == "xpose":
                            rT = rows[0:C, :].T
                            dep = rT[0:1]
                        else:
                            s2 = jnp.sum(rows[:, :], axis=0,
                                         keepdims=True)  # (1, 128)
                            s3 = jnp.sum(s2, axis=1, keepdims=True)
                            dep = jnp.zeros((1, C), i32) + s3
                    return (bi + dep + t) % np.int32(nb)

                out_ref[:, :] = lax.fori_loop(0, T, step, blki)

            @jax.jit
            def run(seed):
                with jax.enable_x64(False):
                    return pl.pallas_call(
                        kernel,
                        in_specs=[
                            pl.BlockSpec(memory_space=pltpu.SMEM),
                            pl.BlockSpec(memory_space=pl.ANY),
                        ],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((1, C), jnp.int32),
                        scratch_shapes=pbig._scratch_shapes(C),
                        compiler_params=pltpu.CompilerParams(
                            has_side_effects=True),
                    )(seed.reshape(1), tblw)

            np.asarray(run(jnp.int32(0)))
            best = 1e9
            for i in range(reps):
                t0 = time.perf_counter()
                np.asarray(run(jnp.int32(i + 1)))
                best = min(best, time.perf_counter() - t0)
            print(f"gw C={C} T={T}: {best*1e3:.2f} ms/call, "
                  f"{best/T*1e6:.1f} us/step")
        return

    if variant == "gwk":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from bwamem_tpu.ops import pallas_bigsmem as pbig
        tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
        nb = int(d.blocks.shape[0])
        nrows = int(tblw.shape[0])
        Ks = [int(x) for x in os.environ.get("MB_K", "1,2,4").split(",")]
        C = int(os.environ.get("MB_C", "256"))
        T = int(os.environ.get("MB_T", "2048"))
        for K in Ks:
            _gwk_one(jax, jnp, lax, np, pbig, tblw, K, C, T, reps)
        return

    # full-superstep variants on real reads
    from bwamem_tpu.io.fastq import ChunkReader
    from bwamem_tpu.ops.smem import smem_superstep
    from bwamem_tpu.core.pipeline import encode_read
    reads = ChunkReader(os.path.join(DATA, "reads_se.fq")) \
        .read_chunk(1 << 30)
    for r in reads:
        encode_read(r)
    L, M, OC = 128, 16, 48
    rng = np.random.default_rng(0)

    def make_args(seed):
        rs = [reads[i] for i in
              rng.permutation(len(reads))[:B % (len(reads) + 1)]] or reads
        qpad = np.full((B, L), 4, dtype=np.int8)
        qlen = np.zeros(B, np.int32)
        for i in range(B):
            r = reads[(seed * B + i) % len(reads)]
            qpad[i, :r.l_seq] = r.seq_nt4
            qlen[i] = r.l_seq
        qp = qpad[:, 0::2] | (qpad[:, 1::2] << np.int8(4))
        return (jnp.asarray(qp), jnp.asarray(qlen),
                jnp.full(B, 1, dtype=d.L2.dtype),
                jnp.ones(B, bool), jnp.full(B, 29, np.int32),
                jnp.full(B, 10, np.int32))

    mode = {"big": "big", "xla": False, "onehot": True}[variant]
    if variant == "onehot":
        os.environ["BWAMEM_TPU_PALLAS_SMEM_BLOCKS"] = "100000000"

    def run(seed):
        q, qlen, mi, act, sl, sw = make_args(seed)
        return smem_superstep(
            d.blocks, d.primary, d.L2, q, qlen, mi, act, sl, sw,
            L=L, M=M, OUT_CAP=OC, NEED_X1=False, PALLAS=mode,
            GCAP=12 * B, QPACKED=True)

    t0 = time.perf_counter()
    jax.block_until_ready(run(0))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    best = 1e9
    for i in range(reps):
        t0 = time.perf_counter()
        r = run(i + 1)
        np.asarray(r[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{variant} B={B}: {best*1e3:.1f} ms/superstep "
          f"({B/best:.0f} lanes/s)")


if __name__ == "__main__":
    main()
