"""Gather-strategy microbench for the occ-table row gather at large
table sizes (the production-genome regime where the one-hot matmul cap
is exceeded).  Each variant runs in its own invocation so a pathological
lowering cannot block the others:

    python tools/microbench_gather.py <variant> [n_blocks] [iters]

variants: fwd_gather   blocks[blk] at (2,B) int32 indices
          flat_gather  blocks[flat] at (2B,) indices
          take         jnp.take(blocks, flat, axis=0)
          bwd_gather   blocks[blk] at (2,B,16) indices
          pallas       ops.pallas_occ DMA kernel ((2B,) lookups)
          onehot       one-hot bf16 matmul (small tables only)
Driver: tools/run_gather_bench.sh style loop with per-variant timeout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

B = int(os.environ.get("MB_B", "2048"))


def main():
    variant = sys.argv[1]
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 62500
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax
    import jax.numpy as jnp
    from jax import lax
    from functools import partial

    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.integers(0, 1 << 32, size=(n_blocks, 16), dtype=np.uint64)
        .astype(np.uint32))

    if variant == "pallas":
        from bwamem_tpu.ops.pallas_occ import (gather_rows_pallas,
                                               wide_blocks)
        wide = wide_blocks(blocks)

        @partial(jax.jit, static_argnames=("iters",))
        def loop(wide, idx, iters):
            def body(c, _):
                rows = gather_rows_pallas(wide, c >> 3)
                nxt = (c + rows[:, 0].astype(jnp.int32)) % (n_blocks - 8)
                return nxt, None
            c, _ = lax.scan(body, idx, None, length=iters)
            return c
        idx = jnp.asarray(rng.integers(0, n_blocks - 8, size=(2 * B,)),
                          dtype=jnp.int32)
        args = (wide, idx)
    else:
        if variant == "fwd_gather":
            shape, mode = (2, B), "g"
        elif variant == "flat_gather":
            shape, mode = (2 * B,), "g"
        elif variant == "take":
            shape, mode = (2 * B,), "t"
        elif variant == "bwd_gather":
            shape, mode = (2, B, 16), "g"
        elif variant == "onehot":
            shape, mode = (2 * B,), "o"
        else:
            raise SystemExit(f"unknown variant {variant}")

        @partial(jax.jit, static_argnames=("iters",))
        def loop(blocks, idx, iters):
            def body(c, _):
                if mode == "g":
                    rows = blocks[c]
                elif mode == "t":
                    rows = jnp.take(blocks, c, axis=0)
                else:
                    oh = (c[:, None]
                          == jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
                          ).astype(jnp.bfloat16)
                    sh = jnp.arange(4, dtype=jnp.int64) * 8
                    t8 = ((blocks.astype(jnp.int64)[:, :, None] >> sh)
                          & 0xFF).reshape(n_blocks, 64).astype(jnp.bfloat16)
                    out = lax.dot_general(
                        oh, t8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    rows = out[:, :16].astype(jnp.int32)
                nxt = (c + rows[..., 0].astype(jnp.int32)) % n_blocks
                nxt = jnp.abs(nxt)
                return nxt, None
            c, _ = lax.scan(body, idx, None, length=iters)
            return c
        idx = jnp.asarray(rng.integers(0, n_blocks, size=shape),
                          dtype=jnp.int32)
        args = (blocks, idx)

    t0 = time.perf_counter()
    r = jax.block_until_ready(loop(*args, iters))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.block_until_ready(loop(*args, iters))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{variant} n_blocks={n_blocks} B={B}: "
          f"{dt/iters*1e6:.1f} us/iter (first call {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
