"""Attribute the 4096-point GLV fixed-base MSM's device time by
chained-iteration slope (same method as tools/probe_bary.py): gather/select
versus the mixed-add fold scan versus the final ladder.

Usage: python tools/probe_msm.py [k_lo k_hi]
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from kzg_rust_tpu.utils.observability import enable_compile_cache

enable_compile_cache()

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import msm as M
from kzg_rust_tpu.ops.fields import FP

N = 4096
FOLD = 8192


def fetch_time(fn, *args, reps=4):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn_builder, args, k_lo, k_hi):
    t_lo = fetch_time(fn_builder(k_lo), *args)
    t_hi = fetch_time(fn_builder(k_hi), *args)
    return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi


def main():
    k_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    k_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = random.Random(0x135)
    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(N)]
    table, inf_mask = M._build_glv_table_kernel(
        jnp.asarray(C.points_to_jacobian(pts))
    )
    table = jax.device_put(table)
    np.asarray(table[0, 0, 0, 0])
    scal = [rng.randrange(R) for _ in range(N)]
    d1h, d2h = M.recode_glv_host(scal)
    d1 = jax.device_put(jnp.asarray(d1h, jnp.int32))
    d2 = jax.device_put(jnp.asarray(d2h, jnp.int32))
    np.asarray(d1[0, 0])

    def bump_digits(d, pt):
        return d + (pt[0, :1] >> 31).astype(d.dtype)

    def full(k):
        def run(t, im, a, b):
            def step(_, c):
                a, b = c
                out = M._msm_core_glv(t, im, a, b, FOLD)
                return (bump_digits(a, out), b)

            return lax.fori_loop(0, k, step, (a, b))[0][0, :1]

        return jax.jit(run)

    per, t_lo, t_hi = slope(full, (table, inf_mask, d1, d2), k_lo, k_hi)
    print(f"full MSM:     t{k_lo}={t_lo*1e3:7.1f} t{k_hi}={t_hi*1e3:7.1f} -> {per*1e3:7.2f} ms/iter")

    # gather/select only (sum the selected limbs to keep everything live)
    def gather_only(k):
        def run(t, im, a, b):
            def step(_, c):
                a, b = c
                n = t.shape[2]
                beta = jnp.asarray(C.BETA_MONT)

                def g(digits, phi):
                    mag = jnp.abs(digits)
                    idx = jnp.maximum(mag - 1, 0)[:, None, :, None, None]
                    sel = jnp.take_along_axis(t, idx.astype(jnp.int32), axis=1)[:, 0]
                    x = sel[..., 0, :]
                    if phi:
                        x = L.mont_mul(FP, x, beta)
                    y = jnp.where(
                        (digits < 0)[..., None],
                        L.neg_mod(FP, sel[..., 1, :]),
                        sel[..., 1, :],
                    )
                    return jnp.stack([x, y], axis=-2)

                s = jnp.sum(g(a, False), axis=(0, 1), dtype=jnp.uint32) + jnp.sum(
                    g(b, True), axis=(0, 1), dtype=jnp.uint32
                )
                return (bump_digits(a, s[0][None].T), b)

            return lax.fori_loop(0, k, step, (a, b))[0][0, :1]

        return jax.jit(run)

    per_g, t_lo, t_hi = slope(gather_only, (table, inf_mask, d1, d2), k_lo, k_hi)
    print(f"gather only:  t{k_lo}={t_lo*1e3:7.1f} t{k_hi}={t_hi*1e3:7.1f} -> {per_g*1e3:7.2f} ms/iter")

    # fold only, on a resident pre-gathered tensor
    beta = jnp.asarray(C.BETA_MONT)
    mag = jnp.abs(d1)
    idx = jnp.maximum(mag - 1, 0)[:, None, :, None, None]
    sel = jnp.take_along_axis(table, idx.astype(jnp.int32), axis=1)[:, 0]
    pts_flat = jnp.concatenate([sel, sel], axis=1).reshape(2 * 26 * N, 2, FP.nlimbs)
    valid = jnp.ones((pts_flat.shape[0],), bool)
    pts_flat = jax.device_put(pts_flat)
    np.asarray(pts_flat[0, 0, 0])

    def fold_only(k):
        def run(p, v):
            def step(_, c):
                out = C.fold_reduce_mixed(c, v, FOLD)
                return c + (out[0, :1] >> 31).astype(c.dtype)[None]

            return lax.fori_loop(0, k, step, p)[0, 0, :1]

        return jax.jit(run)

    per_f, t_lo, t_hi = slope(fold_only, (pts_flat, valid), k_lo, k_hi)
    print(f"fold only:    t{k_lo}={t_lo*1e3:7.1f} t{k_hi}={t_hi*1e3:7.1f} -> {per_f*1e3:7.2f} ms/iter")

    # ladder only (the final log2(fold) levels on a resident [FOLD] buffer)
    buf = jax.device_put(C.proj_infinity((FOLD,)) + 0)
    np.asarray(buf[0, 0, 0])

    def ladder_only(k):
        half_inf = C.proj_infinity((FOLD // 2,))
        levels = FOLD.bit_length() - 1

        def run(b0):
            def step(_, b):
                def body(_, bb):
                    s = C.proj_add(bb[0::2], bb[1::2])
                    return jnp.concatenate([s, half_inf], axis=0)

                out = lax.fori_loop(0, levels, body, b)
                return b + (out[0, 0, :1] >> 31).astype(b.dtype)[None, None]

            return lax.fori_loop(0, k, step, b0)[0, 0, :1]

        return jax.jit(run)

    per_l, t_lo, t_hi = slope(ladder_only, (buf,), k_lo, k_hi)
    print(f"ladder only:  t{k_lo}={t_lo*1e3:7.1f} t{k_hi}={t_hi*1e3:7.1f} -> {per_l*1e3:7.2f} ms/iter")

    print(f"sum of parts: {(per_g + per_f) * 1e3:.2f} ms (fold includes the ladder)")


if __name__ == "__main__":
    main()
