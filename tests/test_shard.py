"""--shard i/n: chunk-strided multi-host data parallelism.

Shards must partition the input chunks disjointly and completely, and
each shard's records must be byte-identical to the same chunks run by
an unsharded process (shard-local determinism: the per-shard
n_processed numbering keys the hash tie-breaks)."""

import os
import subprocess
import sys

import pytest

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "-m", "bwamem_tpu.cli", "mem"] + args,
        cwd=REPO, env=env, capture_output=True, timeout=600)
    assert out.returncode == 0, out.stderr.decode()[-500:]
    return [l for l in out.stdout.decode().splitlines()
            if not l.startswith("@")]


def test_shard_partition():
    env = {"BWAMEM_TPU_CHUNK_BP": "20000"}
    full = _run([os.path.join(DATA, "genome.fa"),
                 os.path.join(DATA, "reads_se.fq")], env)
    s0 = _run(["--shard", "0/2", os.path.join(DATA, "genome.fa"),
               os.path.join(DATA, "reads_se.fq")], env)
    s1 = _run(["--shard", "1/2", os.path.join(DATA, "genome.fa"),
               os.path.join(DATA, "reads_se.fq")], env)
    names = lambda ls: set(l.split("\t")[0] for l in ls)
    assert not (names(s0) & names(s1))
    assert names(s0) | names(s1) == names(full)
    assert len(s0) + len(s1) == len(full)
