"""Round-2 probe: where does the device batch-verify time go?

Micro-measurements on the real chip:
  1. proj_double/proj_add latency at various widths inside a scan
  2. the full _dbl_add_ladder at width 128 (the batch kernel's shape)
  3. the wide gather+fold path (MSM-style) for comparison
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops.fields import FP
from kzg_rust_tpu.golden import curve as gc


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def rand_points(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    base = gc.G1_GENERATOR
    acc = base
    for i in range(n):
        pts.append(acc)
        acc = gc.g1_add(acc, base)
    return jnp.asarray(C.points_to_proj(pts))


def main():
    for width in (64, 128, 256, 512):
        pts = rand_points(width)

        # N sequential doublings via scan
        @jax.jit
        def chain(p, steps=128):
            def step(acc, _):
                return C.proj_double(acc), None
            return lax.scan(step, p, None, length=steps)[0]

        t, _ = timeit(chain, pts)
        print(f"double-chain width={width:4d} 128 steps: {t*1e3:8.2f} ms  ({t/128*1e6:7.1f} us/step)")

    # ladder (double+add+select per step, 255 steps) at width 128
    pts = rand_points(128)
    bits = jnp.asarray(np.random.randint(0, 2, size=(255, 128)).astype(np.uint8))

    @jax.jit
    def ladder(points, bits):
        def step(acc, b):
            acc = C.proj_double(acc)
            added = C.proj_add(acc, points)
            return C.point_select(b != 0, added, acc), None
        init = C.proj_infinity((points.shape[0],))
        return lax.scan(step, init, bits)[0]

    t, _ = timeit(ladder, pts, bits)
    print(f"ladder width=128 255 steps:      {t*1e3:8.2f} ms  ({t/255*1e6:7.1f} us/step)")

    # wide fold_reduce of 8192 points (MSM-reduce shape)
    pts8k = jnp.asarray(np.tile(np.asarray(rand_points(256)), (32, 1, 1)))
    @jax.jit
    def reduce_wide(p):
        return C.fold_reduce(p, 2048)
    t, _ = timeit(reduce_wide, pts8k)
    print(f"fold_reduce 8192 pts (fold 2048):{t*1e3:8.2f} ms")

    # single wide add at width 4096
    a = jnp.asarray(np.tile(np.asarray(rand_points(256)), (16, 1, 1)))
    b = jnp.asarray(np.tile(np.asarray(rand_points(256, 1)), (16, 1, 1)))
    @jax.jit
    def one_add(x, y):
        return C.proj_add(x, y)
    t, _ = timeit(one_add, a, b)
    print(f"one proj_add width=4096:         {t*1e3:8.2f} ms")

    t, _ = timeit(one_add, a[:128], b[:128])
    print(f"one proj_add width=128:          {t*1e3:8.2f} ms")

    # mont_mul alone at width 128 and 4096
    x = a[:, 0, :]
    @jax.jit
    def mm(u, v):
        return L.mont_mul(FP, u, v)
    t, _ = timeit(mm, x[:128], x[:128])
    print(f"one mont_mul width=128:          {t*1e3:8.2f} ms")
    t, _ = timeit(mm, x, x)
    print(f"one mont_mul width=4096:         {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
