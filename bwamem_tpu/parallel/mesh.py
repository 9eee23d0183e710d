"""Multi-chip scale-out: data-parallel read sharding over a device mesh.

The reference's parallelism is N CPU worker threads multiplexing one
FPGA through a manager-thread mailbox (software/fastmap.c:320-429,
kthread_batch.c).  The TPU-native replacement (SURVEY.md §2.4) is a
1-D `reads` mesh: the FM-index tables are replicated per chip (the
analog of the one-time 3 GB SPL_BWT_ref upload, software/bwa.c:286-301),
read batches are sharded across chips, and the only cross-chip
communication in the whole pipeline is the insert-size-statistics
reduction between worker1 and worker2 (mem_pestat over the whole chunk,
software/bwamem.c:1631-1634) — expressed as a psum over per-shard
orientation histograms riding ICI.
"""

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.fm import DeviceFmIndex
from ..ops import smem as smem_mod
from ..ops import fm as fm_mod

READS_AXIS = "reads"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (READS_AXIS,))


def sharded_smem1(mesh: Mesh, dfm: DeviceFmIndex, L: int, M: int):
    """smem1_batched sharded over the reads axis: index replicated,
    per-read arrays split across chips.  Returns a jitted callable with
    the same signature as smem1_batched minus the index args."""
    rep = P()
    shr = P(READS_AXIS)

    def step(blocks, primary, L2, q, qlen, x, min_intv, active):
        return smem_mod.smem1_batched(blocks, primary, L2, q, qlen, x,
                                      min_intv, active, L=L, M=M)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(rep, rep, rep, shr, shr, shr, shr, shr),
        out_specs=(shr,) * 8,
        check_vma=False)

    @jax.jit
    def run(q, qlen, x, min_intv, active):
        return fn(dfm.blocks, dfm.primary, dfm.L2, q, qlen, x,
                  min_intv, active)

    return run


def sharded_sa_lookup(mesh: Mesh, dfm: DeviceFmIndex, max_steps: int = 128):
    """Batched bwt_sa sharded over the reads axis."""
    rep = P()
    shr = P(READS_AXIS)

    def step(blocks, primary, L2, seq_len, sa, k):
        return fm_mod.sa_lookup_batched(blocks, primary, L2, seq_len, sa,
                                        dfm.sa_intv, k,
                                        max_steps=max_steps)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(rep, rep, rep, rep, rep, shr),
                   out_specs=(shr, shr), check_vma=False)

    @jax.jit
    def run(k):
        return fn(dfm.blocks, dfm.primary, dfm.L2, dfm.seq_len, dfm.sa, k)

    return run


def pestat_histograms(mesh: Mesh):
    """The one true collective of the pipeline: reduce per-shard
    insert-size observations (per FF/FR/RF/RR orientation) across chips
    before the pairing stage (mem_pestat, software/bwamem_pair.c:46-107
    runs over the *whole* chunk).

    Takes isize int64[B] and orientation int32[B] (−1 = no observation),
    both sharded over reads; returns, replicated, per-orientation counts
    and a bounded histogram of insert sizes for percentile estimation."""
    MAX_ISIZE = 65536  # observations beyond this are clamped into the tail

    def local(isize, orient):
        valid = orient >= 0
        o = jnp.where(valid, orient, 0)
        v = jnp.clip(jnp.where(valid, isize, 0), 0, MAX_ISIZE - 1)
        hist = jnp.zeros((4, MAX_ISIZE), jnp.int32)
        hist = hist.at[o, v].add(valid.astype(jnp.int32))
        counts = jnp.zeros((4,), jnp.int64).at[o].add(
            valid.astype(jnp.int64))
        hist = jax.lax.psum(hist, READS_AXIS)
        counts = jax.lax.psum(counts, READS_AXIS)
        return counts, hist

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(READS_AXIS), P(READS_AXIS)),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


def pad_to_shards(arr: np.ndarray, n_shards: int, fill) -> np.ndarray:
    """Pad the leading dim to a multiple of the shard count."""
    n = arr.shape[0]
    rem = (-n) % n_shards
    if rem == 0:
        return arr
    pad = np.full((rem,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)
