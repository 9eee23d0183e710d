"""Dump the TPU-optimized HLO of one extend-scan iteration to see the
fusion structure and per-iteration op count (diagnosis for the
~300us/iteration cost measured by microbench_smem)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

B = int(os.environ.get("MB_B", "2048"))
SHAPE2 = os.environ.get("MB_SHAPE2")  # set for (B, M) backward shape
M = int(os.environ.get("MB_M", "16"))


def main():
    from bwamem_tpu.index import load_index
    from bwamem_tpu.ops.fm import DeviceFmIndex, extend
    import jax
    import jax.numpy as jnp
    from jax import lax
    from functools import partial

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "data")
    fm, bns = load_index(os.path.join(data, "genome.fa"))
    d = DeviceFmIndex.from_host(fm)
    n = int(fm.seq_len)
    shape = (B, M) if SHAPE2 else (B,)

    @jax.jit
    def loop_extend(blocks, primary, L2, x0, x1, s):
        def body(c, _):
            x0, x1, s = c
            o0, o1, os_ = extend(blocks, primary, L2, x0, x1, s,
                                 is_back=True)
            x0n = jnp.clip(o0[..., 1], 1, n - 2)
            x1n = jnp.clip(o1[..., 1], 1, n - 2)
            sn = jnp.clip(os_[..., 1], 1, 64)
            return (x0n, x1n, sn), None
        (x0, x1, s), _ = lax.scan(body, (x0, x1, s), None, length=100)
        return x0

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(1, n // 2, size=shape), dtype=jnp.int64)
    x1 = jnp.asarray(rng.integers(1, n // 2, size=shape), dtype=jnp.int64)
    s = jnp.asarray(rng.integers(1, 64, size=shape), dtype=jnp.int64)
    lowered = loop_extend.lower(d.blocks, d.primary, d.L2, x0, x1, s)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = os.environ.get("HLO_OUT", "/tmp/extend_hlo.txt")
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")
    # quick summary: ops inside the while body
    import re
    fus = re.findall(r"^\s*(?:ROOT )?%?([\w.-]+) = .*fusion", txt,
                     re.M)
    print("fusion computations:", len(fus))
    for name in ("while", "dynamic-slice", "dynamic-update-slice",
                 "gather", "dot", "convert", "transpose", "copy"):
        print(name, txt.count(" %s(" % name), txt.count("%s(" % name))


if __name__ == "__main__":
    main()
