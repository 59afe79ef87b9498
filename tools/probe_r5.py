"""Per-kernel isolation timings for the device batch-verify pipeline at
mainnet n=64 (width 128 points), fetch-synced, inputs pre-committed on
device so no upload rides the timed path.
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kzg_rust_tpu.utils.observability import enable_compile_cache

enable_compile_cache()

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import msm as M
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops.fields import FR


def fetch_time(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # compile+sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = random.Random(0xCAFE)
    n = 64
    npad = 64

    # Compressed points on device.
    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(2 * npad)]
    comp_np = np.frombuffer(
        b"".join(gc.g1_compress(p) for p in pts), dtype=np.uint8
    ).reshape(2 * npad, 48)
    comp = jax.device_put(jnp.asarray(comp_np))
    np.asarray(comp)

    # 1. uncompress alone
    t = fetch_time(V.g1_uncompress_kernel, comp)
    print(f"uncompress [128]:              {t*1e3:8.1f} ms")

    # 2. full points program (uncompress + chain + subgroup), fetch flags only
    @jax.jit
    def points_only(c):
        bases, bases2, flags = V.batch_points(c)
        return flags

    t = fetch_time(points_only, comp)
    print(f"points pgm flags-only [128]:   {t*1e3:8.1f} ms")

    # 3. chain alone
    points = V.g1_uncompress_kernel(comp)[0]
    points = jax.device_put(points)
    np.asarray(points[0])

    @jax.jit
    def chain_only(p):
        bases, bases2 = V.bases_chain(p)
        return bases[-1, 0, 0, :3]

    t = fetch_time(chain_only, points)
    print(f"bases_chain alone [128]:       {t*1e3:8.1f} ms")

    # 4. subgroup from bases alone
    @jax.jit
    def subgroup_only(p):
        bases, bases2 = V.bases_chain(p)
        return V.subgroup_check_from_bases(p, bases, bases2)

    t = fetch_time(subgroup_only, points)
    print(f"chain+subgroup [128]:          {t*1e3:8.1f} ms")

    # 5. bary at [64, 4096]
    roots = None
    from kzg_rust_tpu.utils.domain import compute_roots_of_unity

    roots = compute_roots_of_unity(12)
    rr = FR.mont_r
    roots_m = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [(w * rr) % R for w in roots]))
    roots_m2 = jnp.asarray(
        L.ints_to_limbs(FR.nlimbs, [(w * rr * rr) % R for w in roots])
    )
    inv_n_m = jnp.asarray(L.int_to_limbs(FR.nlimbs, (pow(4096, -1, R) * rr) % R))
    blob_np = np.frombuffer(
        b"".join(b"\x00" + rng.randbytes(31) for _ in range(n * 4096)),
        dtype=np.uint8,
    ).reshape(n, 4096, 32)
    blob_dev = jax.device_put(jnp.asarray(blob_np))
    np.asarray(blob_dev[0, 0])
    xs = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(n)]))

    t = fetch_time(
        V.bary_batch_from_bytes_kernel, 4096, roots_m, roots_m2, inv_n_m, blob_dev, xs
    )
    print(f"bary [64 x 4096]:              {t*1e3:8.1f} ms")

    # 6. stage2 alone
    bases, bases2 = V.bases_chain(points)
    bases = jax.device_put(bases)
    bases2 = jax.device_put(bases2)
    np.asarray(bases[0, 0, 0])
    r_powers = [rng.randrange(R) for _ in range(npad)]
    r_times_z = [rng.randrange(R) for _ in range(npad)]
    digits = jnp.asarray(V.stage2_digits(npad, r_powers, r_times_z))
    gen_table = V.build_generator_table()
    sy = jnp.asarray(M.recode_signed_digits([rng.randrange(R)], 1), dtype=jnp.int32)

    t = fetch_time(V.batch_stage2_kernel, bases, bases2, digits, gen_table, sy)
    print(f"stage2 [n=64]:                 {t*1e3:8.1f} ms")

    # 7. 4096-point GLV fixed-base MSM (the commitment hot kernel),
    # device-resident affine table + digits
    scal = [rng.randrange(R) for _ in range(4096)]
    d1, d2 = M.recode_glv_host(scal)
    pts_j = C.points_to_jacobian(
        [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(4096)]
    )
    table, inf_mask = M._build_glv_table_kernel(jnp.asarray(pts_j))
    np.asarray(table[0, 0, 0, 0])
    t = fetch_time(
        M._msm_glv_kernel,
        table,
        inf_mask,
        jnp.asarray(d1, dtype=jnp.int32),
        jnp.asarray(d2, dtype=jnp.int32),
        8192,
    )
    print(f"4096-pt GLV MSM (table resident): {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
