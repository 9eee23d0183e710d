"""Probe Mosaic feature support needed by the big-table DMA superstep:
  a) (1, C) VMEM->SMEM index bounce DMA + scalar reads idxs[0, j]
  b) in-kernel (C, 128) -> (128, C) int32 transpose
  c) fori_loop DMA issue with dynamic semaphore / scratch-row indexing
Each probe prints OK/FAILED with a correctness check.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 256
NR = 4096
rng = np.random.default_rng(0)
tbl_np = rng.integers(0, 1 << 31, size=(NR, 128), dtype=np.int64) \
    .astype(np.int32)
tbl = jnp.asarray(tbl_np)
idx_np = rng.integers(0, NR, size=(1, C)).astype(np.int32)
idx = jnp.asarray(idx_np)


def probe(name, fn, check):
    try:
        out = np.asarray(fn())
        ok = check(out)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as ex:
        print(f"{name}: FAILED: {type(ex).__name__}: "
              f"{str(ex).splitlines()[0][:200]}")


# ---- a) (1, C) bounce + unrolled DMA gather + b) transpose ----------
def kernel_a(idx_ref, tbl_ref, out_ref, idxs, rows, sems, bsem):
    cp = pltpu.make_async_copy(idx_ref, idxs, bsem)
    cp.start()
    cp.wait()
    copies = []
    for j in range(C):
        jj = jnp.int32(j)
        cp = pltpu.make_async_copy(
            tbl_ref.at[pl.ds(idxs[0, j], 1), :],
            rows.at[pl.ds(jj, 1), :],
            sems.at[jj])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()
    out_ref[:, :] = rows[:, :].T  # (128, C)


@jax.jit
def run_a(idx, tbl):
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel_a,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, C), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((1, C), jnp.int32),
                pltpu.VMEM((C, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((C,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tbl)


probe("a+b: (1,C) bounce + unrolled DMA + transpose",
      lambda: run_a(idx, tbl),
      lambda out: np.array_equal(out, tbl_np[idx_np[0]].T))


# ---- c) fori_loop DMA issue with dynamic sem/scratch indexing -------
def kernel_c(idx_ref, tbl_ref, out_ref, idxs, rows, sems, bsem):
    cp = pltpu.make_async_copy(idx_ref, idxs, bsem)
    cp.start()
    cp.wait()

    def issue(j, _):
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(idxs[0, j], 1), :],
            rows.at[pl.ds(j, 1), :],
            sems.at[j]).start()
        return 0

    lax.fori_loop(0, C, issue, 0)

    def drain(j, _):
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(idxs[0, j], 1), :],
            rows.at[pl.ds(j, 1), :],
            sems.at[j]).wait()
        return 0

    lax.fori_loop(0, C, drain, 0)
    out_ref[:, :] = rows[:, :]


@jax.jit
def run_c(idx, tbl):
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel_c,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, 128), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((1, C), jnp.int32),
                pltpu.VMEM((C, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((C,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tbl)


probe("c: fori_loop issue/drain with dynamic sem index",
      lambda: run_c(idx, tbl),
      lambda out: np.array_equal(out, tbl_np[idx_np[0]]))
