"""In-kernel DMA-wave gather microbench for the BIG-table SMEM path.

The reference's design point is an occ table too big for on-chip
memory, fetched 64 B at a time per extension step over CCI-P
(hardware/afu_core.v:1428-1432).  The TPU-native analog keeps the
table HBM-resident as 512-byte rows (8 occ blocks) and has the Mosaic
superstep issue a WAVE of per-lane row DMAs each extension step.  This
bench measures the per-step cost of that wave, including the
VMEM->SMEM index bounce the real kernel needs (per-lane indices are
computed as vectors; DMA starts need scalars):

    python tools/microbench_dmawave.py <variant> [n_rows] [C] [T]

variants: dep     full data dependency step->step (realistic bound)
          nodep   same wave, indices don't read fetched rows
          null    no DMAs (bounce + index arithmetic only)
          vdirect scalar index read straight from VMEM (no SMEM hop)

C = DMAs per step (lanes), T = in-kernel steps, n_rows = table rows
(power of two; 512 B each).  Reports us/step and ns/DMA.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, seeds, *args, n=6):
    """Each call gets a DISTINCT seed: the axon relay returns repeated
    identical dispatches anomalously fast (cached), so identical-args
    best-of timing is invalid (memory: axon-tunnel-perf-model)."""
    np.asarray(fn(jnp.int32(9999), *args))  # forced host fetch
    best = 1e9
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(jnp.int32(seeds[i]), *args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "dep"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    T = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    assert n_rows & (n_rows - 1) == 0
    MASK = np.int32(n_rows - 1)
    A = np.int32(1103515245)
    B = np.int32(12345)

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(
        0, 1 << 31, size=(n_rows, 128), dtype=np.int64).astype(np.int32))
    idx0 = jnp.asarray(
        rng.integers(0, n_rows, size=(C, 1)), dtype=jnp.int32)

    def kernel(seed_ref, idx0_ref, tbl_ref, out_ref, idxv, idxs, rows,
               sems, bsem):
        idxv[:, :] = (idx0_ref[:, :] + seed_ref[0]) & MASK

        def step(t, _):
            if variant != "vdirect":
                cp = pltpu.make_async_copy(idxv, idxs, bsem)
                cp.start()
                cp.wait()
            if variant != "null":
                copies = []
                for j in range(C):
                    jj = jnp.int32(j)
                    if variant == "vdirect":
                        rid = idxv[j, 0]
                    else:
                        rid = idxs[j, 0]
                    cp = pltpu.make_async_copy(
                        tbl_ref.at[pl.ds(rid, 1), :],
                        rows.at[pl.ds(jj, 1), :],
                        sems.at[jj])
                    cp.start()
                    copies.append(cp)
                for cp in copies:
                    cp.wait()
            old = idxv[:, :]
            if variant in ("dep", "vdirect"):
                s = jnp.sum(rows[:, :], axis=1, keepdims=True)  # (C, 1)
                new = ((old ^ s) * A + B + t) & MASK
            else:
                new = (old * A + B + t) & MASK
            idxv[:, :] = new
            return 0

        lax.fori_loop(0, T, step, 0)
        out_ref[:, :] = idxv[:, :] + jnp.sum(
            rows[:, :], axis=1, keepdims=True)

    @jax.jit
    def run(seed, idx0, tbl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, 1), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((C, 1), jnp.int32),
                    pltpu.SMEM((C, 1), jnp.int32),
                    pltpu.VMEM((C, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA((C,)),
                    pltpu.SemaphoreType.DMA(()),
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(seed.reshape(1), idx0, tbl)

    t0 = time.perf_counter()
    try:
        jax.block_until_ready(run(jnp.int32(0), idx0, tbl))
    except Exception as ex:
        print(f"{variant}: FAILED: {type(ex).__name__}: {ex}")
        return
    compile_s = time.perf_counter() - t0
    dt = timed(run, list(range(1, 9)), idx0, tbl)
    print(f"{variant} n_rows={n_rows} C={C} T={T}: {dt*1e3:.2f} ms/call, "
          f"{dt/T*1e6:.1f} us/step, {dt/(T*C)*1e9:.0f} ns/DMA "
          f"(compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
