"""Pallas TPU kernel: occ-table row gather as a generated-one-hot
matmul on the MXU.

The SMEM backward pass needs ~200k occ-block rows per while-loop
iteration.  XLA's TPU gather serializes those (~1.7 ms/iteration); the
pure-XLA one-hot matmul fixes the small-batch case but materializes a
(rows, n_blocks) bf16 operand through HBM, which drowns the wide case
(see ops/fm.py:_gather_rows).  This kernel keeps both operands in
VMEM: each grid step compares its tile of row indices against a lane
iota to *generate* the one-hot tile in registers/VMEM and feeds it
straight to the MXU against the VMEM-resident table — HBM sees only
the indices in and the gathered rows out.

The table ships pre-split into uint8 columns (values <= 255) so the
f32 MXU accumulation is exact — the same trick as the XLA path.  This
is the TPU analog of the reference FPGA streaming occ lines from its
BRAM-cached table rows (hardware/afu_core.v:1428-1432): the "BRAM" is
VMEM, the 16-PE fetch fan-out is a 2048-row one-hot tile.

Gated to tables that fit VMEM alongside the one-hot tile
(n_blocks <= ~4k rows, i.e. references up to ~500 kbp); larger tables
keep the XLA paths until the k-tiled variant lands.

Measured on v5e (196k rows/call, 1641-block table): 2.25 ms/call vs
the XLA serialized gather's 1.68 ms — the 96-step grid launch overhead
and the f32 output traffic eat the MXU win at this table size, so the
XLA paths stay the default (enable with BWAMEM_TPU_PALLAS_GATHER=1).
The shipped fix was narrowing the SMEM working width instead (M=16,
sized from measured interval counts — p99 is 11, max 13).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

ROW_TILE = 2048        # index rows per grid step
TAB_COLS = 128         # 64 uint8 planes (16 words x 4 bytes), zero-padded


def onehot_gather_available(n_blocks: int) -> bool:
    return (_HAVE_PALLAS and jax.default_backend() == "tpu"
            and n_blocks <= 4096)


def _kernel(idx_ref, tab_ref, out_ref):
    nbp = tab_ref.shape[0]
    rt = idx_ref.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (rt, nbp), 1)
    oh = (col == idx_ref[...]).astype(jnp.bfloat16)
    out_ref[...] = lax.dot_general(
        oh, tab_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _run(idx2, tab, n_pad: int, interpret: bool = False):
    grid = n_pad // ROW_TILE
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec(tab.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, TAB_COLS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, TAB_COLS), jnp.float32),
        interpret=interpret,
    )(idx2, tab)


def onehot_table(blocks: jnp.ndarray) -> jnp.ndarray:
    """(n_blocks, 16) uint32 -> (pad128(n_blocks), 128) bf16 uint8
    planes (columns 64..127 zero).  Loop-invariant: XLA hoists it out
    of the smem while_loops."""
    n_blocks = blocks.shape[0]
    sh = jnp.arange(4, dtype=jnp.int64) * 8
    t8 = ((blocks.astype(jnp.int64)[:, :, None] >> sh) & 0xFF)
    t8 = t8.reshape(n_blocks, 64).astype(jnp.bfloat16)
    nbp = -(-n_blocks // 128) * 128
    return jnp.pad(t8, ((0, nbp - n_blocks), (0, TAB_COLS - 64)))


def gather_rows_onehot(tab: jnp.ndarray, blk: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Gather uint32[..., 16] occ-block rows via the kernel.  `tab`
    comes from onehot_table(blocks)."""
    shp = blk.shape
    flat = blk.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    n_pad = max(-(-n // ROW_TILE) * ROW_TILE, ROW_TILE)
    idx2 = jnp.pad(flat, (0, n_pad - n)).reshape(n_pad, 1)
    with jax.enable_x64(False):   # Mosaic kernels are 32-bit
        out = _run(idx2, tab, n_pad, interpret)
    r8 = out[:n, :64].astype(jnp.int64).reshape(n, 16, 4)
    w = (r8[..., 0] | (r8[..., 1] << 8) | (r8[..., 2] << 16)
         | (r8[..., 3] << 24)).astype(jnp.uint32)
    return w.reshape(*shp, 16)
