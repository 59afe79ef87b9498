"""Probe 4: ground-truth device compute via giant step counts (wall >> 30ms)."""

import os
import sys
import time
from functools import partial

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


def best_time(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rand_points_arr(n):
    pts = []
    acc = gc.G1_GENERATOR
    for i in range(n):
        pts.append(acc)
        acc = gc.g1_add(acc, gc.G1_GENERATOR)
    return jnp.asarray(C.points_to_proj(pts))


@partial(jax.jit, static_argnums=1)
def chain(p, steps):
    def step(acc, _):
        return C.proj_double(acc), None
    return lax.scan(step, p, None, length=steps)[0]


@partial(jax.jit, static_argnums=1)
def mm_chain(x, steps):
    def step(acc, _):
        return L.mont_mul(FP, acc, acc), None
    return lax.scan(step, x, None, length=steps)[0]


def main():
    for width in (128, 512):
        pts = rand_points_arr(width)
        tA = best_time(chain, pts, 16384)
        tB = best_time(chain, pts, 131072)
        per = (tB - tA) / (131072 - 16384)
        print(f"dbl width={width}: t16k={tA*1e3:.1f}ms t128k={tB*1e3:.1f}ms -> {per*1e6:.3f} us/dbl "
              f"({per/8*1e9:.1f} ns/mont_mul eff)")

    for width in (128, 1024, 8192):
        x = rand_points_arr(min(width, 512))[:, 0, :]
        if width > 512:
            x = jnp.asarray(np.tile(np.asarray(x), (width // 512, 1)))
        tA = best_time(mm_chain, x, 16384)
        tB = best_time(mm_chain, x, 131072)
        per = (tB - tA) / (131072 - 16384)
        print(f"mont_mul width={width}: {per*1e9:.1f} ns/mul  "
              f"(throughput {width/per/1e9:.2f} Gmul/s)" if per > 0 else f"mont_mul width={width}: ~0")


if __name__ == "__main__":
    main()
