"""In-process A/B of superstep_pallas_big configs (one table upload).

    BWAMEM_TPU_BENCH_DATA=/tmp/ref256 python tools/ab_superstep.py \
        "HALVES=1" "HALVES=2" "HALVES=2,FWD_GUARD=0" [B] [reps]

Each config is a comma list of BWAMEM_TPU_BIG_* suffix=value pairs set
before the (unjitted) superstep_pallas_big call — a fresh trace per
config, same device table.  Prints ms/superstep best-of-reps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

DATA = os.environ.get("BWAMEM_TPU_BENCH_DATA", "/tmp/ref256")


def main():
    cfgs = [a for a in sys.argv[1:] if "=" in a]
    rest = [a for a in sys.argv[1:] if "=" not in a]
    B = int(rest[0]) if rest else 8192
    reps = int(rest[1]) if len(rest) > 1 else 3

    import jax
    import jax.numpy as jnp
    from bwamem_tpu.index import load_index
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.ops import pallas_bigsmem as pbig
    from bwamem_tpu.io.fastq import ChunkReader
    from bwamem_tpu.core.pipeline import encode_read

    fm, bns = load_index(os.path.join(DATA, "genome.fa"))
    d = DeviceFmIndex.from_host(fm)
    tblw = jax.jit(pbig.prep_table_wide)(d.blocks)
    jax.block_until_ready(tblw)
    print(f"table rows={tblw.shape[0]} cdt={d.cdt}", file=sys.stderr)

    reads = ChunkReader(os.path.join(DATA, "reads_se.fq")) \
        .read_chunk(1 << 30)
    for r in reads:
        encode_read(r)
    L, M, OC = 128, 16, 48

    def make_args(seed):
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

    for cfg in cfgs:
        for kv in cfg.split(","):
            k, v = kv.split("=")
            os.environ["BWAMEM_TPU_BIG_" + k] = v

        # fresh jit per config: the env is read at trace time, and an
        # UNJITTED superstep_pallas_big call would re-trace the whole
        # Mosaic kernel per invocation (trace time scales with the
        # kernel size and drowns the device time)
        @jax.jit
        def run_dev(q, qlen, mi, act, sl, sw):
            return pbig.superstep_pallas_big(
                tblw, d.primary, d.L2, q, qlen, mi, act, sl, sw,
                L=L, M=M, OUT_CAP=OC, NEED_X1=False, interpret=False,
                packed=True)

        def run(seed):
            return run_dev(*make_args(seed))

        t0 = time.perf_counter()
        jax.block_until_ready(run(0))
        print(f"[{cfg}] compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        best = 1e9
        for i in range(reps):
            t0 = time.perf_counter()
            r = run(i + 1)
            np.asarray(r[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{cfg} B={B}: {best*1e3:.1f} ms/superstep "
              f"({B/best:.0f} lanes/s)")


if __name__ == "__main__":
    main()
