"""Split one smem_superstep dispatch into compute vs download cost.

Times, on the real dataset at BWAMEM_TPU_LANES lanes:
  - dispatch -> block_until_ready with outputs left on device (compute)
  - jax.device_get of the output tuple (the 7-buffer download)
  - jax.device_get of one fused buffer of the same total bytes
    (how much of the download is per-buffer round trips)
Drives the OUT_CAP / wire-format decisions in ops/seeding.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

LANES = int(os.environ.get("BWAMEM_TPU_LANES", "2048"))
OUT_CAP = int(os.environ.get("BWAMEM_TPU_OUT_CAP", "48"))


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
    from bwamem_tpu.ops.smem import smem_superstep
    from bwamem_tpu.io.fastq import ChunkReader
    from bwamem_tpu.core.pipeline import encode_read
    from bwamem_tpu.config import MemOptions
    import jax
    import jax.numpy as jnp

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "data")
    fm, bns = load_index(os.path.join(data, "genome.fa"))
    d = DeviceFmIndex.from_host(fm)
    opt = MemOptions()
    reads = ChunkReader(os.path.join(data, "reads_se.fq")).read_chunk(1 << 30)
    for r in reads:
        encode_read(r)
    B, L, M = LANES, 128, 16
    qpad = np.full((B, L), 4, dtype=np.int8)
    qlen = np.zeros(B, dtype=np.int32)
    for i in range(B):
        q = reads[i % len(reads)].seq_nt4
        qpad[i, :len(q)] = q
        qlen[i] = len(q)
    sl = int(opt.min_seed_len * opt.split_factor + .499)
    args = (d.blocks, d.primary, d.L2, jnp.asarray(qpad),
            jnp.asarray(qlen), jnp.ones(B, d.L2.dtype),
            jnp.ones(B, bool), jnp.full(B, sl, np.int32),
            jnp.full(B, opt.split_width, np.int32))
    from bwamem_tpu.ops.pallas_smem import smem1_pallas_available
    use_pallas = (os.environ.get("MB_PALLAS", "1") != "0"
                  and smem1_pallas_available(d.blocks.shape[0], d.cdt,
                                             L, M))
    print("pallas:", use_pallas)
    kw = dict(L=L, M=M, OUT_CAP=OUT_CAP, NEED_X1=False,
              PALLAS=use_pallas)

    out = smem_superstep(*args, **kw)
    jax.block_until_ready(out)
    n_out = np.asarray(out[5])
    print(f"lanes={B} OUT_CAP={OUT_CAP} n_out: mean={n_out.mean():.1f} "
          f"p99={np.percentile(n_out, 99):.0f} max={n_out.max()}")
    nbytes = sum(np.asarray(o).nbytes for o in out)
    print(f"output bytes: {nbytes/1e6:.2f} MB over {len(out)} buffers")

    t_comp = med(lambda: jax.block_until_ready(
        smem_superstep(*args, **kw)))
    print(f"dispatch+compute (no download): {t_comp*1e3:8.2f} ms")

    out = smem_superstep(*args, **kw)
    jax.block_until_ready(out)
    t_get = med(lambda: jax.device_get(out))
    print(f"device_get 7 buffers:           {t_get*1e3:8.2f} ms")

    one = jnp.zeros(nbytes, jnp.uint8)
    one.block_until_ready()
    t_one = med(lambda: jax.device_get(one))
    print(f"device_get 1 fused buffer:      {t_one*1e3:8.2f} ms")

    e2e = med(lambda: jax.device_get(smem_superstep(*args, **kw)))
    print(f"dispatch+compute+download:      {e2e*1e3:8.2f} ms")

    def pipe(n=8):
        devs = [smem_superstep(*args, **kw) for _ in range(n)]
        for dv in devs:
            jax.device_get(dv)
    tp = med(lambda: pipe(), n=3)
    print(f"8 pipelined dispatches:         {tp*1e3:8.2f} ms "
          f"({tp/8*1e3:.2f} ms marginal)")

    nul = jax.jit(lambda v: v + 1)
    import jax.numpy as jnp
    one = jnp.zeros((8, 128), jnp.int32)
    tn = med(lambda: jax.device_get(nul(one)))
    print(f"null dispatch RTT:              {tn*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
