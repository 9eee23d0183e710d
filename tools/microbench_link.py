#!/usr/bin/env python3
"""Host<->device link microbench over the axon tunnel: round-trip
latency of a null dispatch, upload bandwidth (device_put), and download
bandwidth (device_get) at the wave sizes the engine uses.  Separates
"dispatch RTT" from "bytes on the wire" so kernel/wave changes can be
judged: if RTT dominates, consolidate dispatches; if upload BW
dominates, move operands device-resident (e.g. pac for extension
targets)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=8):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev)

    one = jnp.zeros((8, 128), jnp.int32)
    add = jax.jit(lambda x: x + 1)
    rtt = timeit(lambda: jax.device_get(add(one)))
    print(f"null dispatch+get RTT: {rtt*1e3:.2f} ms")

    for mb in (0.25, 1.0, 4.0, 16.0):
        nbytes = int(mb * (1 << 20))
        host = np.zeros(nbytes, np.uint8)
        up = timeit(lambda: jax.device_put(host, dev).block_until_ready())
        print(f"upload {mb:5.2f} MiB: {up*1e3:7.2f} ms "
              f"({nbytes/up/(1 << 20):8.1f} MiB/s)")

    for mb in (0.25, 1.0, 4.0):
        nbytes = int(mb * (1 << 20))
        darr = jnp.zeros(nbytes, jnp.uint8)
        darr.block_until_ready()
        down = timeit(lambda: jax.device_get(darr))
        print(f"download {mb:5.2f} MiB: {down*1e3:7.2f} ms "
              f"({nbytes/down/(1 << 20):8.1f} MiB/s)")

    # the extend wave's actual shape: packed query+target + params up,
    # 8 rows of int32 down
    B, LQ, LT = 4096, 128, 544
    qt = np.zeros((B, LQ // 2), np.uint8)
    tt = np.zeros((B, LT // 2), np.uint8)
    par = np.zeros((6, B), np.int32)

    @jax.jit
    def fake_wave(q, t, p):
        # output must consume both uploaded operands, or XLA folds the
        # reads away and the hop understates a real wave's latency
        return (q.astype(jnp.int32).sum(1)[None, :]
                + t.astype(jnp.int32).sum(1)[None, :]
                + jnp.zeros((8, B), jnp.int32) + p.sum())

    def run():
        o = fake_wave(jnp.asarray(qt), jnp.asarray(tt), jnp.asarray(par))
        jax.device_get(o)
    w = timeit(run)
    up_bytes = qt.nbytes + tt.nbytes + par.nbytes
    print(f"extend-wave-shaped hop ({up_bytes/1e6:.2f} MB up, "
          f"{8*B*4/1e6:.2f} MB down): {w*1e3:.2f} ms")


if __name__ == "__main__":
    main()
