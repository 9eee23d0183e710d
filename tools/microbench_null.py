"""Pin down the per-iteration while_loop overhead: which dtype/op mix
costs ~400us/iter?  Each variant is one invocation:

    python tools/microbench_null.py <variant> [iters]

variants: i32        int32 carries, arithmetic ops
          i64        int64 carries, arithmetic ops (the original null)
          i64_add    int64 carries, single add
          i64_carry  int64 carries, ops in int32 (convert in/out once)
          i32_wide   int32 (B,16) carries
          i64_wide   int64 (B,16) carries
          popcount   int32 carries + uint32 popcount reduction
          onehot32   int32 one-hot bf16 matmul vs small table
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax
    from functools import partial

    rng = np.random.default_rng(0)

    shape = (B, 16) if variant.endswith("_wide") else (B,)
    dt = jnp.int64 if variant.startswith("i64") else jnp.int32
    x = jnp.asarray(rng.integers(1, 1 << 20, size=shape), dtype=dt)

    @partial(jax.jit, static_argnames=("iters",))
    def loop(x0, x1, s, iters):
        def body(c, _):
            x0, x1, s = c
            if variant == "i64_add":
                return (x1 + 1, x0, s), None
            if variant == "i64_carry":
                a, b, c2 = (x0.astype(jnp.int32), x1.astype(jnp.int32),
                            s.astype(jnp.int32))
                r = (b + 1, a ^ c2, jnp.clip(c2 + a, 1, 64))
                return tuple(v.astype(jnp.int64) for v in r), None
            if variant == "popcount":
                u = (x0 ^ x1).astype(jnp.uint32)
                pc = lax.population_count(u).astype(jnp.int32)
                return (x1 + 1, x0 + pc, jnp.clip(s + pc, 1, 64)), None
            return (x1 + 1, x0 ^ s, jnp.clip(s + x0, 1, 64)), None
        c, _ = lax.scan(body, (x0, x1, s), None, length=iters)
        return c[0]

    if variant == "onehot32":
        nb = 1664
        t8 = jnp.asarray(rng.integers(0, 255, size=(nb, 64)),
                         dtype=np.int32).astype(jnp.bfloat16)

        @partial(jax.jit, static_argnames=("iters",))
        def loop(idx, _a, _b, iters):
            def body(c, _):
                oh = (c[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
                      ).astype(jnp.bfloat16)
                out = lax.dot_general(oh, t8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                return out[:, 0].astype(jnp.int32) % nb, None
            c, _ = lax.scan(body, c := idx, None, length=iters)
            return c
        x = jnp.asarray(rng.integers(0, nb, size=(4 * B,)), dtype=jnp.int32)

    t0 = time.perf_counter()
    r = jax.block_until_ready(loop(x, x, x, iters))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.block_until_ready(loop(x, x, x, iters))
        ts.append(time.perf_counter() - t0)
    print(f"{variant}: {min(ts)/iters*1e6:.1f} us/iter "
          f"(first {comp:.1f}s)")


if __name__ == "__main__":
    main()
