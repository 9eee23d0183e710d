"""Per-pass timing of the Pallas SMEM kernel vs the XLA impl.

Times one smem1 pass (fwd from x=0: ~L fwd steps, no bwd) and one
mid-read pass (fwd+bwd) for both implementations, per 2048 lanes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

B = int(os.environ.get("MB_B", "2048"))
L, M = 128, int(os.environ.get("MB_M", "16"))


def med(fn, n=6):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from bwamem_tpu.index import load_index
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.ops.smem import smem1_batched
    from bwamem_tpu.ops import pallas_smem as psm
    from bwamem_tpu.io.fastq import ChunkReader
    from bwamem_tpu.core.pipeline import encode_read
    import jax
    import jax.numpy as jnp
    from functools import partial

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "data")
    fm, bns = load_index(os.path.join(data, "genome.fa"))
    d = DeviceFmIndex.from_host(fm)
    reads = ChunkReader(os.path.join(data, "reads_se.fq")).read_chunk(1 << 30)
    for r in reads:
        encode_read(r)
    qpad = np.full((B, L), 4, dtype=np.int8)
    qlen = np.zeros(B, dtype=np.int32)
    for i in range(B):
        q = reads[i % len(reads)].seq_nt4
        qpad[i, :len(q)] = q
        qlen[i] = len(q)
    q = jnp.asarray(qpad.astype(np.int32))
    qlenj = jnp.asarray(qlen)
    act = jnp.ones(B, bool)
    mi = jnp.ones(B, d.L2.dtype)
    x0 = jnp.zeros(B, jnp.int32)
    xm = jnp.asarray((qlen // 2).astype(np.int32))

    tbl = jax.jit(psm.prep_table)(d.blocks)
    tbl.block_until_ready()

    pal = jax.jit(partial(psm.smem1_pallas, L=L, M=M))
    xla = partial(smem1_batched, L=L, M=M, M_OUT=0)

    for name, xs in (("x=0 (fwd-only)", x0), ("x=mid (fwd+bwd)", xm)):
        tp = med(lambda: jax.block_until_ready(
            pal(tbl, d.primary, d.L2, q, qlenj, xs,
                mi.astype(jnp.int32), act)))
        tx = med(lambda: jax.block_until_ready(
            xla(d.blocks, d.primary, d.L2, q, qlenj, xs, mi, act)))
        print(f"{name:18s} pallas {tp*1e3:7.2f} ms   xla {tx*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
