"""Pallas TPU kernel for the occ-block gather + popcount hot op.

This is the innermost memory operation of the SMEM search: every
extension step fetches one 64-byte occ block per coordinate (the unit
the reference FPGA fetches over CCI-P per BWT_extend step,
hardware/afu_core.v:1428-1432) and reduces it with popcounts
(BWT_OCC4, hardware/afu_core.v:5653-5897).

The kernel mirrors that data path explicitly: per-lane block indices
arrive via scalar prefetch, each grid step issues a wave of row DMAs
from the HBM-resident table into VMEM (double-buffered across steps),
and the VPU computes the 2-bit-field popcounts.  The kernel is
int32-only (TPU-native); the int64 cumulative checkpoint assembly
happens in the XLA wrapper, so genome sizes beyond 2^31 still work.

Falls back transparently to the pure-XLA gather (ops.fm.occ4) — use
`occ4_pallas_available()` to decide; parity is tested against the host
oracle either way.

Measured on v5e (4096 random lookups/call): XLA gather 1.15 ms/call vs
this kernel 1.59 ms/call — the Mosaic 128-lane alignment forces 512-byte
row DMAs (8x the 64-byte occ block), so the XLA gather remains the
default data path; this kernel documents the explicit-DMA alternative
and wins only if the table layout is rebuilt around 512-byte rows.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

LANE_TILE = 8          # lanes gathered per grid step
_M55 = 0x55555555


def occ4_pallas_available() -> bool:
    return _HAVE_PALLAS and jax.default_backend() == "tpu"


def _gather_kernel(idx_ref,            # scalar-prefetch: int32[B] row ids
                   blocks_hbm,         # uint32[n_rows, 128] in ANY/HBM
                   rows_out,           # uint32[LANE_TILE, 128] output
                   scratch, sems):
    # Mosaic requires HBM slices aligned to the 128-lane tiling, so the
    # table is viewed as 128-word rows (8 occ blocks each); the 16-word
    # window select happens outside the kernel.
    step = pl.program_id(0)
    # static unroll: issue all row DMAs, then drain (int64-free; Pallas
    # TPU kernels are 32-bit)
    copies = []
    for j in range(LANE_TILE):
        jj = jnp.int32(j)  # keep indices 32-bit under jax x64 mode
        blk = idx_ref[step * LANE_TILE + j]
        cp = pltpu.make_async_copy(
            blocks_hbm.at[pl.ds(blk, 1), :],
            scratch.at[pl.ds(jj, 1), :],
            sems.at[jj])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()
    rows_out[:, :] = scratch[:, :]


@partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(blocks: jnp.ndarray, blk: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Gather 128-word rows blocks[blk] ([B, 128] uint32) with a Pallas
    DMA kernel.  B must be a multiple of LANE_TILE; `blocks` must be the
    (n_rows, 128) view of the occ table (see wide_blocks)."""
    B = blk.shape[0]
    grid = (B // LANE_TILE,)
    # trace the kernel in 32-bit mode: under jax x64, index-map literals
    # become i64 constants that Mosaic refuses to legalize
    with jax.enable_x64(False):
        return _pallas_gather(blocks, blk, grid, B, interpret)


def _pallas_gather(blocks, blk, grid, B, interpret):
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (LANE_TILE, 128), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((LANE_TILE, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((LANE_TILE,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.uint32),
        interpret=interpret,
    )(blk.astype(jnp.int32), blocks)


def wide_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """Repack the (n_blocks, 16) occ table into Mosaic-aligned 128-word
    rows (one-time device-side reshape; pads to a multiple of 8 rows)."""
    n = blocks.shape[0]
    padn = (-n) % 8
    if padn:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((padn, 16), blocks.dtype)])
    return blocks.reshape(-1, 128)


def occ4_via_pallas(blocks: jnp.ndarray, primary: jnp.ndarray,
                    k: jnp.ndarray) -> jnp.ndarray:
    """Drop-in occ4 (see ops.fm.occ4) whose row gather runs through the
    Pallas DMA kernel; the popcount reduction and int64 checkpoint
    assembly stay in XLA (fused by the compiler).  `blocks` is the
    wide_blocks() view."""
    orig_shape = k.shape
    k = k.reshape(-1).astype(jnp.int64)
    B = k.shape[0]
    pad = (-B) % LANE_TILE
    if pad:
        k = jnp.concatenate([k, jnp.zeros(pad, jnp.int64)])
    valid = k >= 0
    kk = jnp.where(valid, k - (k >= primary).astype(jnp.int64), 0)
    blk = (kk >> 7).astype(jnp.int32)
    wide = gather_rows_pallas(blocks, blk >> 3)      # 128-word rows
    sub = (blk & 7).astype(jnp.int32)                # block within row
    col = sub[:, None] * 16 + jnp.arange(16, dtype=jnp.int32)[None, :]
    row = jnp.take_along_axis(wide, col, axis=1)

    lo = row[:, 0:8:2].astype(jnp.int64)
    hi = row[:, 1:8:2].astype(jnp.int64)
    ck = lo | (hi << 32)
    words = row[:, 8:16]
    off = (kk & 127).astype(jnp.int32)
    wi = off >> 4
    r = (~off) & 15
    j = jnp.arange(8, dtype=jnp.int32)
    full = j < wi[:, None]
    part = j == wi[:, None]
    pmask = ~((jnp.uint32(1) << (r[:, None].astype(jnp.uint32) * 2))
              - jnp.uint32(1))
    wmask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                      jnp.where(part, pmask, jnp.uint32(0)))
    w = words & wmask
    hb = (w >> 1) & jnp.uint32(_M55)
    lb = w & jnp.uint32(_M55)
    c3 = lax.population_count(hb & lb).astype(jnp.int32).sum(axis=-1)
    c2 = lax.population_count(hb & ~lb).astype(jnp.int32).sum(axis=-1)
    c1 = lax.population_count(lb & ~hb).astype(jnp.int32).sum(axis=-1)
    c0 = (off + 1) - c1 - c2 - c3
    within = jnp.stack([c0, c1, c2, c3], axis=-1).astype(jnp.int64)
    res = jnp.where(valid[:, None], ck + within, jnp.int64(0))
    if pad:
        res = res[:B]
    return res.reshape(orig_shape + (4,))
