"""Round-2 probe, fetch-synced: block_until_ready on the axon tunnel does
not reliably wait for execution, so every timing here forces a tiny HOST
FETCH (np.asarray of a [3] slice) which cannot complete before the program
finishes.  Differential step counts separate fixed dispatch overhead from
per-step compute.
"""

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


def fetch_time(fn, *args, reps=5):
    """Time fn(*args) + fetch of a tiny output slice (true sync)."""
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rand_points_arr(n):
    pts = []
    acc = gc.G1_GENERATOR
    for _ in range(n):
        pts.append(acc)
        acc = gc.g1_add(acc, gc.G1_GENERATOR)
    return jnp.asarray(C.points_to_proj(pts))


@partial(jax.jit, static_argnums=1)
def chain(p, steps):
    def step(acc, _):
        return C.proj_double(acc), None

    out = lax.scan(step, p, None, length=steps)[0]
    return out[0, 0, :3]  # tiny fetch


@partial(jax.jit, static_argnums=(1, 2))
def chain_unroll(p, steps, unroll):
    def step(acc, _):
        return C.proj_double(acc), None

    out = lax.scan(step, p, None, length=steps, unroll=unroll)[0]
    return out[0, 0, :3]


@partial(jax.jit, static_argnums=1)
def mm_chain(x, steps):
    def step(acc, _):
        return L.mont_mul(FP, acc, acc), None

    out = lax.scan(step, x, None, length=steps)[0]
    return out[0, :3]


def main():
    print("== dispatch+fetch floor ==")
    tiny = jnp.zeros((4,), jnp.uint32)
    f = jax.jit(lambda x: x + 1)
    print(f"  noop dispatch+fetch: {fetch_time(f, tiny)*1e3:.2f} ms")

    print("== doubling chain (scan), fetch-synced ==")
    for width in (128, 256, 512):
        pts = rand_points_arr(width)
        t1 = fetch_time(chain, pts, 66)
        t2 = fetch_time(chain, pts, 264)
        per = (t2 - t1) / (264 - 66)
        print(
            f"  width={width:4d}: 66 steps {t1*1e3:7.2f} ms, 264 steps {t2*1e3:7.2f} ms"
            f" -> {per*1e6:7.1f} us/dbl; est 132-step chain {(t1 + per*66)*1e3:7.2f} ms"
        )

    print("== scan unroll effect (width 128, 132 steps) ==")
    pts = rand_points_arr(128)
    for u in (1, 2, 4, 8):
        t = fetch_time(chain_unroll, pts, 132, u)
        print(f"  unroll={u}: {t*1e3:7.2f} ms")

    print("== mont_mul chain, fetch-synced ==")
    for width in (128, 1024, 8192):
        x = rand_points_arr(min(width, 512))[:, 0, :]
        if width > 512:
            x = jnp.asarray(np.tile(np.asarray(x), (width // 512, 1)))
        t1 = fetch_time(mm_chain, x, 64)
        t2 = fetch_time(mm_chain, x, 256)
        per = (t2 - t1) / (256 - 64)
        print(
            f"  width={width:5d}: {per*1e6:8.2f} us/mul -> {width/per/1e9 if per>0 else float('nan'):7.3f} Gmul/s"
        )


if __name__ == "__main__":
    main()
