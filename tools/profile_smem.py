"""Profile one smem_iter_step round and one ksw_extend2 wave under
jax.profiler, then aggregate per-op device durations from the xplane
trace (jax.profiler.ProfileData) — ground truth for where kernel time
goes inside the device loops."""
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

B = int(os.environ.get("MB_B", "2048"))
L, M = 128, 16


def main():
    from bwamem_tpu.index import load_index
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.ops.smem import smem_iter_step
    from bwamem_tpu.ops.ksw import ksw_extend2_batched
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
    reader = ChunkReader(os.path.join(data, "reads_se.fq"))
    reads = reader.read_chunk(1 << 30)
    for r in reads:
        encode_read(r)
    qpad = np.full((B, L), 4, dtype=np.int8)
    qlen = np.zeros(B, dtype=np.int32)
    for i in range(B):
        q = reads[i % len(reads)].seq_nt4
        qpad[i, :len(q)] = q
        qlen[i] = len(q)
    smem_args = (d.blocks, d.primary, d.L2, jnp.asarray(qpad),
                 jnp.asarray(qlen), jnp.zeros(B, jnp.int32),
                 jnp.ones(B, jnp.int64), jnp.ones(B, bool),
                 jnp.full(B, 29, jnp.int64), jnp.full(B, 10, jnp.int64))

    rng = np.random.default_rng(0)
    W, LQ, LT = 512, 128, 544
    ext_args = (
        jnp.asarray(rng.integers(0, 4, (W, LQ)), jnp.int8),
        jnp.asarray(rng.integers(0, 4, (W, LT)), jnp.int8),
        jnp.asarray(np.full(W, 80), jnp.int32),
        jnp.asarray(np.full(W, 200), jnp.int32),
        jnp.asarray(np.array(opt.mat, np.int32)),
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
        jnp.asarray(np.full(W, 100), jnp.int32),
        jnp.asarray(np.full(W, 5), jnp.int32), opt.zdrop,
        jnp.asarray(np.full(W, 80), jnp.int32))

    # warm (compile)
    jax.block_until_ready(smem_iter_step(*smem_args, L=L, M=M, M_OUT=M))
    jax.block_until_ready(ksw_extend2_batched(*ext_args, LQ=LQ, LT=LT))
    print("warm done", flush=True)

    tdir = "/tmp/jaxprof"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        jax.block_until_ready(smem_iter_step(*smem_args, L=L, M=M,
                                             M_OUT=M))
        jax.block_until_ready(ksw_extend2_batched(*ext_args, LQ=LQ,
                                                  LT=LT))

    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("xplanes:", paths)
    for p in paths:
        pd = jax.profiler.ProfileData.from_serialized_xspace(
            open(p, "rb").read())
        for plane in pd.planes:
            tot = defaultdict(float)
            cnt = defaultdict(int)
            nlines = 0
            for line in plane.lines:
                nlines += 1
                for ev in line.events:
                    name = ev.name
                    dur = ev.duration_ns / 1e6
                    tot[name] += dur
                    cnt[name] += 1
            if not tot:
                continue
            print(f"== plane {plane.name} ({nlines} lines) ==")
            for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
                print(f"  {ms:9.3f} ms  x{cnt[name]:<6} {name[:90]}")


if __name__ == "__main__":
    main()
