"""Attribute the [64 x 4096] barycentric kernel's device time (VERDICT
round-2 item 2): ablation variants timed by CHAINED-ITERATION slope so the
tunnel's +-10 ms RTT jitter cancels.

Each variant is wrapped in a fori_loop of k body iterations with a fake
data dependency between iterations (adds ``y >> 31`` — always zero, but
XLA cannot fold it), timed fetch-synced at two k values; the slope
(t_hi - t_lo) / (k_hi - k_lo) is the pure per-iteration device time with
both the link RTT and the dispatch overhead subtracted.

Variants:
  full        to_mont + sub + batch-inv + muls + redc-sum + x^n tail
  no_inv      batch_mont_inv replaced by the unchanged denominators
  no_xn       the x^n Fermat-style window-pow tail skipped
  inv_only    batch_mont_inv alone
  terms_only  to_mont + two muls + redc-sum (no inversion, no tail)
  ingest      byte ingest + canonicality alone

Usage: python tools/probe_bary.py [k_lo k_hi]
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

from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops.fields import FR
from kzg_rust_tpu.utils.domain import compute_roots_of_unity

B, N = 64, 4096


def bary_variant(n, roots_m, roots_m2, inv_n_m, evals, xs, *, use_inv=True,
                 use_xn=True, terms_only=False):
    # Mirrors verify_kernels.bary_batch_kernel (canonical evals, w R^2 trick).
    mul = lambda u, v: L.mont_mul(FR, u, v)
    x_m = L.to_mont(FR, xs)
    d = L.sub_mod(FR, x_m[:, None, :], jnp.broadcast_to(roots_m, evals.shape))
    inv = L.batch_mont_inv(FR, d, axis=1) if use_inv else d
    terms = mul(mul(inv, roots_m2), evals)
    s = L.sum_mont_redc(FR, terms, axis=1)
    if terms_only:
        return s
    s = mul(s, inv_n_m)
    xn = L.mont_pow_const(FR, x_m, n) if use_xn else x_m
    one_m = jnp.asarray(FR.one_mont)
    return mul(s, L.sub_mod(FR, xn, one_m))


def chained(body, k: int):
    """body(evals, xs) -> y [B, l]; iterate k times with a no-op dependency."""

    def run(evals, xs):
        def step(_, carry):
            e, x = carry
            y = body(e, x)
            bump = (y[:, None, :1] >> 31).astype(e.dtype)  # always 0
            return (e + bump, x)

        e, x = lax.fori_loop(0, k, step, (evals, xs))
        return e[0, 0, :1]

    return jax.jit(run)


def fetch_time(fn, *args, reps=4):
    np.asarray(fn(*args))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    k_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    k_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = random.Random(0xBA27)
    roots = compute_roots_of_unity(12)
    rr = FR.mont_r
    roots_m = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [(w * rr) % R for w in roots]))
    roots_m2 = jnp.asarray(
        L.ints_to_limbs(FR.nlimbs, [(w * rr * rr) % R for w in roots])
    )
    inv_n_m = jnp.asarray(L.int_to_limbs(FR.nlimbs, (pow(N, -1, R) * rr) % R))
    evals_np = np.stack(
        [
            L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(N)])
            for _ in range(B)
        ]
    )
    evals = jax.device_put(jnp.asarray(evals_np))
    xs = jax.device_put(
        jnp.asarray(L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(B)]))
    )
    np.asarray(evals[0, 0]), np.asarray(xs[0])

    variants = {
        "full": dict(),
        "no_inv": dict(use_inv=False),
        "no_xn": dict(use_xn=False),
        "inv_only": dict(terms_only=True),  # combined below
        "terms_only": dict(use_inv=False, terms_only=True),
    }

    print(f"chained-slope timing, k={k_lo}->{k_hi}, [B={B} x N={N}]")
    results = {}
    for name, kw in variants.items():
        if name == "inv_only":
            def body(e, x, kw=kw):
                d = L.sub_mod(
                    FR,
                    L.to_mont(FR, x)[:, None, :],
                    jnp.broadcast_to(roots_m, e.shape),
                )
                inv = L.batch_mont_inv(FR, d, axis=1)
                return inv[:, 0]
        else:
            def body(e, x, kw=kw):
                return bary_variant(N, roots_m, roots_m2, inv_n_m, e, x, **kw)

        t_lo = fetch_time(chained(body, k_lo), evals, xs)
        t_hi = fetch_time(chained(body, k_hi), evals, xs)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        results[name] = per
        print(
            f"  {name:11s}: t{k_lo}={t_lo*1e3:7.1f} ms  t{k_hi}={t_hi*1e3:7.1f} ms"
            f"  -> {per*1e3:7.2f} ms/iter"
        )

    full = results.get("full")
    if full:
        print("attribution vs full:")
        for name, per in results.items():
            if name != "full":
                print(f"  full - {name:11s} = {(full - per)*1e3:7.2f} ms")

    # Calibration: the pieces of batch_mont_inv in isolation.
    # (a) the Fermat inversion chain alone at [B, l] (tiny width);
    # (b) one mont_mul at [B, l]; (c) one mont_mul at [B*G, l] (scan-step
    # width); (d) one mont_mul at [B*N, l] (recombine width).
    small = jax.device_put(evals[:, 0, :])  # [B, l]
    mid = jax.device_put(evals[:, :64, :].reshape(-1, evals.shape[-1]))
    wide = jax.device_put(evals.reshape(-1, evals.shape[-1]))
    np.asarray(small[0]), np.asarray(mid[0]), np.asarray(wide[0])

    def chained_u(body, k):
        def run(x):
            def step(_, c):
                y = body(c)
                return c + (y[..., :1] >> 31).astype(c.dtype)

            return lax.fori_loop(0, k, step, x)[0, :1]

        return jax.jit(run)

    cal = {
        "fermat_inv [64]": (small, lambda x: L.mont_inv(FR, x)),
        "mont_mul [64]": (small, lambda x: L.mont_mul(FR, x, x)),
        "mont_mul [4096]": (mid, lambda x: L.mont_mul(FR, x, x)),
        "mont_mul [262144]": (wide, lambda x: L.mont_mul(FR, x, x)),
    }
    print("calibration (chained slope):")
    for name, (arr, body) in cal.items():
        kl, kh = (k_lo, k_hi) if "fermat" in name else (4, 40)
        t_lo = fetch_time(chained_u(body, kl), arr)
        t_hi = fetch_time(chained_u(body, kh), arr)
        per = (t_hi - t_lo) / (kh - kl)
        print(f"  {name:18s}: {per*1e6:9.1f} us/iter")


if __name__ == "__main__":
    main()
