"""Per-stage bound attribution at the SATURATED batch size (VERDICT
round-4 item 4): decompose each of the three device stages at n=4096 into
its component kernels at the exact production chunk widths, time each by
chained-iteration slope (cancels tunnel RTT + dispatch overhead), and
compare against arithmetic floors computed from the same run's measured
mont_mul rates — so every stage can be harvested or declared closed at
bound the way the MSM was (SCALING.md "MSM batched-affine fold").

Production shapes at n=4096 (backends/jax_backend.py):
  stage 1: 4 chunks of 1024 blobs = [2048, 48] compressed points each
  barycentric: 32 chunks of [128, 4096] field elements
  stage 2: ONE full-width dispatch (66-window digit matrix, 6*4096 lanes)

Also probes the stage-2 fold width {4096, 8192, 16384} (fewer, wider scan
steps — same arithmetic) as a candidate harvest.

Usage: python tools/probe_floor4096.py [k_lo k_hi]
Emits human lines + one final JSON summary line.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kzg_rust_tpu.utils.observability import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import P, R
from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops import msm as M
from kzg_rust_tpu.ops.fields import FP, FR
from kzg_rust_tpu.utils.domain import compute_roots_of_unity

TINY = bool(os.environ.get("KZG_PROBE_TINY"))  # CPU smoke-test mode
N_BLOBS = 32 if TINY else 4096
DOMAIN = 4096
S1_CHUNK = 8 if TINY else 1024  # blobs per stage-1 chunk (STAGE1_CHUNK_BLOBS)
PTS = 2 * S1_CHUNK  # points per stage-1 chunk
BARY_CHUNK = 4 if TINY else 128  # blobs per barycentric chunk (BARY_CHUNK_BLOBS)
FOLDS = (64,) if TINY else (4096, 8192, 16384)


def fetch_time(fn, *args, reps=3):
    np.asarray(fn(*args))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_chained, args, k_lo, k_hi, reps=3):
    t_lo = fetch_time(make_chained(k_lo), *args, reps=reps)
    t_hi = fetch_time(make_chained(k_hi), *args, reps=reps)
    return (t_hi - t_lo) / (k_hi - k_lo)


def chained_arr(body, k):
    """body(x_uint32_arr) -> y; iterate with a zero additive dependency."""

    def run(x):
        def step(_, c):
            y = body(c)
            dep = (y.reshape(-1)[:1] >> 31).astype(c.dtype)
            return c + dep.reshape((1,) * (c.ndim - 1) + (1,))

        return lax.fori_loop(0, k, step, x).reshape(-1)[:1]

    return jax.jit(run)


def main():
    k_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    k_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(0xF10042)
    out = {"device": str(jax.devices()[0])}
    print(json.dumps(out), flush=True)
    results = {}

    # ---- calibration: mont_mul rates at the production widths ----------
    fr_wide = jnp.asarray(
        L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(4096)])
    )
    fr_wide = jnp.tile(fr_wide, (BARY_CHUNK, 1))  # [524288, 22]
    fp_rows = jnp.asarray(
        L.ints_to_limbs(FP.nlimbs, [rng.randrange(P) for _ in range(PTS)])
    )  # [PTS, 32] — stage-1 chunk point width
    fp_wide = jnp.tile(fp_rows, (64, 1))  # [131072, 32]
    for name, arr, field in (
        ("fr_mul_524288", fr_wide, FR),
        ("fp_mul_2048", fp_rows, FP),
        ("fp_mul_131072", fp_wide, FP),
    ):
        body = lambda x, f=field: L.mont_mul(f, x, x)
        # Small shapes need a much wider k span: a [2048]-row mul is
        # ~30 us, so a 40-iteration span (~1 ms) drowns in the tunnel's
        # +-10-30 ms fetch jitter and the slope can come out negative
        # (observed round 5).  Scale the span so the timed difference is
        # >= ~50 ms.
        kk = (64, 2048) if arr.shape[0] <= 4096 and not TINY else (8, 48)
        per = slope(lambda k: chained_arr(body, k), (arr,), *kk)
        results[name + "_us"] = round(per * 1e6, 2)
        print(f"calib {name}: {per*1e6:9.2f} us", flush=True)

    fr_rate = fr_wide.shape[0] / (results["fr_mul_524288_us"] * 1e-6)  # rows/s
    fp_rate_wide = fp_wide.shape[0] / (results["fp_mul_131072_us"] * 1e-6)
    fp_rate_2048 = PTS / (results["fp_mul_2048_us"] * 1e-6)

    # ---- stage 1 at chunk width [2048 points] --------------------------
    n_distinct = min(64, PTS)
    pts_host = [
        gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(n_distinct)
    ]
    comp = np.frombuffer(
        b"".join(gc.g1_compress(p) for p in pts_host) * (PTS // n_distinct),
        dtype=np.uint8,
    ).reshape(PTS, 48)
    comp_dev = jax.device_put(jnp.asarray(comp))
    np.asarray(comp_dev[0, 0])

    def s1_full(c):
        bases, bases2, flags = V.batch_points(c)
        dep = (bases[0, 0, 0, :1] + bases2[0, 0, 0, :1]) >> 31
        return flags + dep

    def s1_uncompress(c):
        points, ok = V.g1_uncompress_points(c)
        return points[0, 0, :1] + ok[:1].astype(jnp.uint32)

    def s1_chain(c):
        points, _ = V.g1_uncompress_points(c)
        bases, bases2 = V.bases_chain(points)
        return (bases[0, 0, 0, :1] + bases2[-1, -1, 0, :1]) >> 31

    for name, body in (
        ("s1_chunk_full", s1_full),
        ("s1_chunk_uncompress", s1_uncompress),
        ("s1_chunk_uncompress_chain", s1_chain),
    ):
        per = slope(lambda k: chained_arr(body, k), (comp_dev,), k_lo, k_hi)
        results[name + "_ms"] = round(per * 1e3, 2)
        print(f"{name}: {per*1e3:8.2f} ms/chunk (x4 = {per*4e3:8.1f} ms)", flush=True)

    # Floors: sqrt = ~475 sequential [2048]-row Fp muls (windowed (p+1)/4
    # pow); chain = 132 steps x 16 muls-equivalent (2 proj_double = 2x ~8M)
    # at [2048] rows; subgroup (round-5 rework) = 17 static window slices
    # + 16 tree adds/point + 6 muls — small beside the chain, so no
    # separate floor row.
    sqrt_floor = 475 * PTS / fp_rate_2048
    chain_floor = 132 * 16 * PTS / fp_rate_2048
    results["s1_sqrt_floor_ms"] = round(sqrt_floor * 1e3, 2)
    results["s1_chain_floor_ms"] = round(chain_floor * 1e3, 2)
    print(
        f"s1 floors: sqrt ~{sqrt_floor*1e3:.1f} ms, chain ~{chain_floor*1e3:.1f} ms"
        f" (per chunk, at measured [2048]-row rate)",
        flush=True,
    )

    # ---- barycentric at chunk width [128, 4096] ------------------------
    roots = compute_roots_of_unity(12)
    rr = FR.mont_r
    roots_m = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [(w * rr) % R for w in roots]))
    roots_m2 = jnp.asarray(
        L.ints_to_limbs(FR.nlimbs, [(w * rr * rr) % R for w in roots])
    )
    inv_n_m = jnp.asarray(L.int_to_limbs(FR.nlimbs, (pow(DOMAIN, -1, R) * rr) % R))
    evals = jax.device_put(
        jnp.asarray(
            np.stack(
                [
                    L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(DOMAIN)])
                    for _ in range(BARY_CHUNK)
                ]
            )
        )
    )
    xs = jax.device_put(
        jnp.asarray(L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(BARY_CHUNK)]))
    )
    np.asarray(evals[0, 0]), np.asarray(xs[0])

    def bary_full(e, x):
        return V.bary_batch_kernel(DOMAIN, roots_m, roots_m2, inv_n_m, e, x)

    def bary_inv_only(e, x):
        d = L.sub_mod(FR, L.to_mont(FR, x)[:, None, :], jnp.broadcast_to(roots_m, e.shape))
        return L.batch_mont_inv(FR, d, axis=1)[:, 0]

    def bary_terms_only(e, x):
        d = L.sub_mod(FR, L.to_mont(FR, x)[:, None, :], jnp.broadcast_to(roots_m, e.shape))
        terms = L.mont_mul(FR, L.mont_mul(FR, d, roots_m2), e)
        return L.sum_mont_redc(FR, terms, axis=1)

    def chained2(body, k):
        def run(e, x):
            def step(_, carry):
                ee, xx = carry
                y = body(ee, xx)
                bump = (y.reshape(-1)[:1] >> 31).astype(ee.dtype)
                return (ee + bump.reshape(1, 1, 1), xx)

            e2, _ = lax.fori_loop(0, k, step, (e, x))
            return e2[0, 0, :1]

        return jax.jit(run)

    for name, body in (
        ("bary_chunk_full", bary_full),
        ("bary_chunk_inv_only", bary_inv_only),
        ("bary_chunk_terms_only", bary_terms_only),
    ):
        per = slope(lambda k: chained2(body, k), (evals, xs), k_lo, max(k_hi, 8))
        results[name + "_ms"] = round(per * 1e3, 3)
        print(f"{name}: {per*1e3:8.2f} ms/chunk (x32 = {per*32e3:8.1f} ms)", flush=True)

    # Floors at the measured wide-Fr rate: inversion tree ~3 muls/elem,
    # terms 2 muls + 1 redc-sum-equivalent, tail ~1.
    elems = BARY_CHUNK * DOMAIN
    results["bary_inv_floor_ms"] = round(3 * elems / fr_rate * 1e3, 2)
    results["bary_terms_floor_ms"] = round(3 * elems / fr_rate * 1e3, 2)
    print(
        f"bary floors/chunk: inv ~{3*elems/fr_rate*1e3:.2f} ms, "
        f"terms ~{3*elems/fr_rate*1e3:.2f} ms",
        flush=True,
    )

    # ---- stage 2 at full width -----------------------------------------
    bases_small, bases2_small = V.batch_points(comp_dev)[:2]  # [66, PTS, 3, l]
    s2_tile = (2 * N_BLOBS) // PTS
    bases = jnp.tile(bases_small, (1, s2_tile, 1, 1))  # [66, 2*N_BLOBS, 3, l]
    bases2 = jnp.tile(bases2_small, (1, s2_tile, 1, 1))
    np.asarray(bases[0, 0, 0, 0])

    r_powers = [rng.randrange(R) for _ in range(N_BLOBS)]
    r_times_z = [rng.randrange(R) for _ in range(N_BLOBS)]
    digits = jnp.asarray(V.stage2_digits(N_BLOBS, r_powers, r_times_z))
    gen_table = V.build_generator_table()
    syd = jnp.asarray(M.recode_signed_digits([12345], 1), dtype=jnp.int32)
    np.asarray(digits[0, 0]), np.asarray(syd[0, 0])

    def s2_full(b, b2, d):
        outp = V.batch_stage2(b, b2, d, gen_table, syd)
        return (outp[0, 0, :1] + outp[1, 0, :1]) >> 31

    def chained3(body, k):
        def run(b, b2, d):
            def step(_, carry):
                dd = carry
                y = body(b, b2, dd)
                return dd + y.reshape(-1)[:1].astype(dd.dtype).reshape(1, 1)

            return lax.fori_loop(0, k, step, d)[0, :1]

        return jax.jit(run)

    per = slope(lambda k: chained3(s2_full, k), (bases, bases2, digits), k_lo, k_hi)
    results["s2_full_ms"] = round(per * 1e3, 2)
    print(f"s2_full: {per*1e3:8.2f} ms", flush=True)

    # fold_reduce alone at the two lane-group sizes, three fold widths.
    lhs_n = 66 * N_BLOBS * 2
    rhs_n = 66 * N_BLOBS * 4
    flat = jnp.tile(bases_small[:, :, None, :, :].reshape(-1, 3, FP.nlimbs), (8, 1, 1))
    flat_lhs = flat[:lhs_n]
    flat_rhs = jnp.tile(flat, (2, 1, 1))[:rhs_n]
    np.asarray(flat_lhs[0, 0, 0]), np.asarray(flat_rhs[0, 0, 0])

    def chained_fold(arr, fold, k):
        def run(x):
            def step(_, c):
                y = C.fold_reduce(c, fold)
                return c + (y[0, :1] >> 31).astype(c.dtype).reshape(1, 1, 1)

            return lax.fori_loop(0, k, step, x)[0, 0, :1]

        return jax.jit(run)

    for fold in FOLDS:
        t_l = slope(lambda k: chained_fold(flat_lhs, fold, k), (flat_lhs,), k_lo, k_hi)
        t_r = slope(lambda k: chained_fold(flat_rhs, fold, k), (flat_rhs,), k_lo, k_hi)
        results[f"s2_fold{fold}_ms"] = round((t_l + t_r) * 1e3, 2)
        print(
            f"s2 fold_reduce width {fold}: lhs {t_l*1e3:7.2f} + rhs {t_r*1e3:7.2f}"
            f" = {(t_l+t_r)*1e3:7.2f} ms",
            flush=True,
        )

    # Floor: (lhs_n + rhs_n) 12M complete adds at the wide-Fp rate.
    add_rows = lhs_n + rhs_n
    results["s2_add_floor_ms"] = round(add_rows * 12 / fp_rate_wide * 1e3, 2)
    print(
        f"s2 floor: {add_rows} row-adds x 12M at wide-Fp rate ~"
        f"{add_rows*12/fp_rate_wide*1e3:.1f} ms",
        flush=True,
    )

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
