"""Probe 3: slope method — per-step device compute cost, dispatch excluded."""

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


def best_time(fn, *args, reps=4):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rand_points_arr(n, seed=0):
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
def ladder_n(points, steps):
    bits = jnp.ones((steps, points.shape[0]), jnp.uint8)
    def step(acc, b):
        acc = C.proj_double(acc)
        added = C.proj_add(acc, points)
        return C.point_select(b != 0, added, acc), None
    init = C.proj_infinity((points.shape[0],))
    return lax.scan(step, init, bits)[0]


@partial(jax.jit, static_argnums=1)
def wide_adds(p, reps):
    # p: [N,3,l]; reps sequential adds at width N/2
    def step(acc, _):
        return C.proj_add(acc, acc), None  # same shape, same cost as add
    return lax.scan(step, p, None, length=reps)[0]


@partial(jax.jit, static_argnums=(1, 2))
def mm_seq(x, reps, width):
    def step(acc, _):
        return L.mont_mul(FP, acc, acc), None
    return lax.scan(step, x[:width], None, length=reps)[0]


def slope(fn, arg, n1, n2, label, unit_count=None):
    t1 = best_time(fn, arg, n1)
    t2 = best_time(fn, arg, n2)
    per = (t2 - t1) / (n2 - n1)
    print(f"{label}: t({n1})={t1*1e3:.1f}ms t({n2})={t2*1e3:.1f}ms -> {per*1e6:.1f} us/step")
    return per


def main():
    for width in (128, 256, 512):
        pts = rand_points_arr(width)
        slope(chain, pts, 128, 1152, f"double width={width}")
    pts = rand_points_arr(128)
    slope(ladder_n, pts, 255, 1275, "ladder(dbl+add+sel) width=128")
    for width in (1024, 4096, 16384):
        reps_pts = rand_points_arr(256)
        big = jnp.asarray(np.tile(np.asarray(reps_pts), (width // 256, 1, 1)))
        slope(wide_adds, big, 4, 36, f"proj_add width={width}")
    x = rand_points_arr(256)[:, 0, :]
    big = jnp.asarray(np.tile(np.asarray(x), (64, 1)))
    for width in (128, 4096, 16384):
        f = partial(mm_seq, big)
        t1 = best_time(mm_seq, big, 8, width)
        t2 = best_time(mm_seq, big, 72, width)
        per = (t2 - t1) / 64
        print(f"mont_mul width={width}: {per*1e6:.2f} us/mul")


if __name__ == "__main__":
    main()
