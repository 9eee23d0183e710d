"""Compile smem_iter_step for the TPU and report the fused-kernel
structure of its while-loop bodies (how many kernels launch per
iteration, and their shapes) — the per-iteration launch count is the
suspected dominant cost."""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

B = int(os.environ.get("MB_B", "2048"))
L = 128
M = 16


def main():
    from bwamem_tpu.index import load_index
    from bwamem_tpu.ops.fm import DeviceFmIndex
    from bwamem_tpu.ops.smem import smem_iter_step
    import jax
    import jax.numpy as jnp

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "data")
    fm, bns = load_index(os.path.join(data, "genome.fa"))
    d = DeviceFmIndex.from_host(fm)

    args = (d.blocks, d.primary, d.L2,
            jnp.zeros((B, L), jnp.int8), jnp.full(B, 101, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.ones(B, jnp.int64),
            jnp.ones(B, bool), jnp.full(B, 29, jnp.int64),
            jnp.full(B, 10, jnp.int64))
    lowered = smem_iter_step.lower(*args, L=L, M=M, M_OUT=M)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = os.environ.get("HLO_OUT", "/tmp/smem_hlo.txt")
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")

    # find while-loop body computations and count ops inside each
    bodies = re.findall(r"^%?([\w.-]*body[\w.-]*) \(", txt, re.M)
    print("body computations:", bodies)
    # count fusion instructions per computation block
    cur = None
    counts = {}
    kinds = {}
    for line in txt.splitlines():
        mm = re.match(r"^%?([\w.-]+) \(.*\) -> .* \{", line)
        if mm:
            cur = mm.group(1)
            continue
        if cur is None:
            continue
        m2 = re.search(r"= (\S+?)[( ]", line.strip())
        if m2:
            op = m2.group(1)
            base = re.sub(r"\..*", "", op)
            counts.setdefault(cur, 0)
            if base in ("fusion", "custom-call", "dot", "convolution",
                        "gather", "scatter", "while", "all-reduce",
                        "dynamic-slice", "dynamic-update-slice", "copy",
                        "convert", "transpose", "reduce", "iota",
                        "broadcast"):
                counts[cur] += 1
                kinds.setdefault(cur, {}).setdefault(base, 0)
                kinds[cur][base] = kinds[cur][base] + 1
    for name, c in sorted(counts.items(), key=lambda kv: -kv[1])[:12]:
        if "body" in name or "while" in name or c > 10:
            print(f"{name}: {c} major ops  {kinds.get(name)}")


if __name__ == "__main__":
    main()
