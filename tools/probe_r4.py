"""Link characterization for the tunneled axon device: RTT, D2H/H2D
bandwidth, and whether queued dispatches pipeline (throughput vs latency).
All timings fetch-synced (np.asarray); block_until_ready does not sync here.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kzg_rust_tpu.utils.observability import enable_compile_cache

enable_compile_cache()


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")

    # --- RTT: fetch a tiny committed array repeatedly
    x = jax.device_put(jnp.zeros((4,), jnp.uint32), dev)
    np.asarray(x)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    print(f"tiny D2H fetch: min {min(ts)*1e3:.2f} ms  median {sorted(ts)[5]*1e3:.2f} ms  max {max(ts)*1e3:.2f} ms")

    # --- D2H bandwidth
    for mb in (1, 8, 32):
        big = jax.device_put(jnp.zeros((mb * 1024 * 1024 // 4,), jnp.uint32), dev)
        np.asarray(big)
        t0 = time.perf_counter()
        np.asarray(big)
        dt = time.perf_counter() - t0
        print(f"D2H {mb:3d} MB: {dt*1e3:7.2f} ms -> {mb/dt:7.1f} MB/s")

    # --- H2D bandwidth (device_put + tiny dependent fetch to sync)
    f = jax.jit(lambda a: a[:1])
    for mb in (1, 8, 32):
        host = np.zeros((mb * 1024 * 1024 // 4,), np.uint32)
        np.asarray(f(jax.device_put(host, dev)))  # warm/compile
        t0 = time.perf_counter()
        d = jax.device_put(host, dev)
        np.asarray(f(d))
        dt = time.perf_counter() - t0
        print(f"H2D {mb:3d} MB (+sync): {dt*1e3:7.2f} ms -> {mb/dt:7.1f} MB/s")

    # --- do queued dispatches pipeline?  k dependent no-ops then one fetch
    g = jax.jit(lambda a: a + 1)
    y = jax.device_put(jnp.zeros((4,), jnp.uint32), dev)
    np.asarray(g(y))
    for k in (1, 4, 16, 64):
        t0 = time.perf_counter()
        z = y
        for _ in range(k):
            z = g(z)
        np.asarray(z)
        dt = time.perf_counter() - t0
        print(f"{k:3d} chained no-op dispatches + 1 fetch: {dt*1e3:7.2f} ms ({dt/k*1e3:6.2f} ms/dispatch)")

    # --- independent dispatch+fetch pairs back-to-back (ping-pong cost)
    t0 = time.perf_counter()
    for _ in range(8):
        np.asarray(g(y))
    dt = time.perf_counter() - t0
    print(f"8 ping-pong dispatch+fetch: {dt*1e3:7.2f} ms ({dt/8*1e3:6.2f} ms each)")

    # --- async host->compute->host with copy_to_host_async style overlap
    h = jax.jit(lambda a: (a + 1)[:4])
    big_in = np.zeros((8 * 1024 * 1024 // 4,), np.uint32)
    np.asarray(h(jax.device_put(big_in, dev)))
    t0 = time.perf_counter()
    outs = [h(jax.device_put(big_in, dev)) for _ in range(4)]
    for o in outs:
        np.asarray(o)
    dt = time.perf_counter() - t0
    print(f"4 overlapped 8MB-upload jobs: {dt*1e3:7.2f} ms total")


if __name__ == "__main__":
    main()
