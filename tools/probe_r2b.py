"""Probe 2: per-rep timings, varied inputs, correctness check."""

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


def rand_points(n, seed=0):
    pts = []
    base = gc.G1_GENERATOR
    acc = base
    for i in range(n):
        pts.append(acc)
        acc = gc.g1_add(acc, base)
    return pts


def main():
    width = 128
    pts_int = rand_points(width)
    pts = jnp.asarray(C.points_to_proj(pts_int))

    @jax.jit
    def chain(p):
        def step(acc, _):
            return C.proj_double(acc), None
        return lax.scan(step, p, None, length=128)[0]

    # compile
    out = jax.block_until_ready(chain(pts))
    # correctness: 2^128 * P_0
    got = C.proj_to_points(np.asarray(out)[:1])[0]
    want = gc.g1_mul(pts_int[0], 1 << 128)
    print("chain correct:", got == want)

    for r in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(pts))
        print(f"  chain rep{r}: {(time.perf_counter()-t0)*1e3:.3f} ms")

    # vary input each rep (defeat any result caching)
    variants = [jnp.asarray(C.points_to_proj(rand_points(width, s))) for s in range(3)]
    for r, v in enumerate(variants):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(v))
        print(f"  chain varied rep{r}: {(time.perf_counter()-t0)*1e3:.3f} ms")

    @jax.jit
    def one_mm(u, v):
        return L.mont_mul(FP, u, v)

    x = pts[:, 0, :]
    jax.block_until_ready(one_mm(x, x))
    for r in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(one_mm(x, x))
        print(f"  one_mm rep{r}: {(time.perf_counter()-t0)*1e3:.3f} ms")

    # mont_mul without MXU path (force the pad variant)
    @jax.jit
    def one_mm_pad(u, v):
        n = FP.nlimbs
        tcols = L._mul_cols_pad(u, v, 2 * n)
        tlo = L.csave(tcols[..., :n], 2)
        m = L.csave(L._mul_cols_pad(tlo, jnp.asarray(FP.nprime_limbs), n), 2)
        ucols = tcols + L._mul_cols_pad(m, jnp.asarray(FP.mod_limbs), 2 * n)
        full = L.normalize(ucols)
        return L.cond_sub_mod(FP, full[..., n:])

    jax.block_until_ready(one_mm_pad(x, x))
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(one_mm_pad(x, x))
        print(f"  one_mm_pad rep{r}: {(time.perf_counter()-t0)*1e3:.3f} ms")

    # empty dispatch baseline
    @jax.jit
    def nop(u):
        return u + 1

    jax.block_until_ready(nop(x))
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(nop(x))
        print(f"  nop rep{r}: {(time.perf_counter()-t0)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
