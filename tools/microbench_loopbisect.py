"""Bisect WHICH property of the smem-style device loop costs ~400us per
iteration on the axon tunnel: while_loop-vs-fori, int64 carries, carry
count/size, dynamic trip count."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

ITERS = 64
B = 2048


def timed(fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def report(name, fn, *args):
    t = timed(fn, *args)
    print(f"{name}: {t*1e3:.2f} ms ({t/ITERS*1e6:.1f} us/iter)")


def main():
    x32 = jnp.ones((B,), jnp.int32)
    x64 = jnp.ones((B,), jnp.int64)

    @jax.jit
    def fori32(x):
        return lax.fori_loop(0, ITERS, lambda i, c: c + 1, x)

    @jax.jit
    def fori64(x):
        return lax.fori_loop(0, ITERS, lambda i, c: c + 1, x)

    @jax.jit
    def while32(x):
        def cond(s):
            return s[1] < ITERS
        def body(s):
            c, i = s
            return c + 1, i + 1
        return lax.while_loop(cond, body, (x, jnp.int32(0)))[0]

    @jax.jit
    def while64(x):
        def cond(s):
            return s[1] < ITERS
        def body(s):
            c, i = s
            return c + 1, i + 1
        return lax.while_loop(cond, body, (x, jnp.int32(0)))[0]

    @jax.jit
    def while64_multi(x):
        # 8 int64 carries like the smem state
        def cond(s):
            return s[-1] < ITERS
        def body(s):
            *cs, i = s
            return tuple(c + 1 for c in cs) + (i + 1,)
        init = tuple(x + k for k in range(8)) + (jnp.int32(0),)
        return lax.while_loop(cond, body, init)[0]

    @jax.jit
    def while64_datadep(x):
        # data-dependent exit (like smem: any(live))
        def cond(s):
            c, i = s
            return jnp.any(c < ITERS * 2) & (i < ITERS)
        def body(s):
            c, i = s
            return c + 1, i + 1
        return lax.while_loop(cond, body, (x, jnp.int32(0)))[0]

    report("fori int32 (2048,)", fori32, x32)
    report("fori int64 (2048,)", fori64, x64)
    report("while int32 (2048,)", while32, x32)
    report("while int64 (2048,)", while64, x64)
    report("while int64 8-carry", while64_multi, x64)
    report("while int64 data-dep cond", while64_datadep, x64)


if __name__ == "__main__":
    main()
