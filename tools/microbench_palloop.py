"""Does a loop INSIDE a Pallas kernel pay the ~400us/iteration fixed
cost that XLA-level while/fori loops pay on the axon tunnel?  If not,
moving the SMEM search and extension DP loops into Pallas kernels
removes the dominant cost of the device path (see memory note
tpu-loop-overhead)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax import lax

ITERS = int(os.environ.get("MB_ITERS", "256"))
SHAPE = (64, 128)


def timed(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    x = jnp.ones(SHAPE, jnp.float32)

    @jax.jit
    def xla_loop(x):
        def body(i, c):
            return c * 1.000001 + 0.5
        return lax.fori_loop(0, ITERS, body, x)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        def body(i, c):
            return c * 1.000001 + 0.5
        o_ref[:, :] = lax.fori_loop(0, ITERS, body, x_ref[:, :])

    @jax.jit
    def pal_loop(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

    t_x = timed(xla_loop, x)
    print(f"xla fori_loop {ITERS} iters: {t_x*1e3:.2f} ms "
          f"({t_x/ITERS*1e6:.1f} us/iter)")
    t_p = timed(pal_loop, x)
    print(f"pallas internal fori_loop {ITERS} iters: {t_p*1e3:.2f} ms "
          f"({t_p/ITERS*1e6:.1f} us/iter)")
    # sanity: results match
    a, b = xla_loop(x), pal_loop(x)
    print("max abs diff:", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
