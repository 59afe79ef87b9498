"""Sub-stage timings of the batched barycentric kernel at [64, 4096]
(the dominant device kernel after the round-2 GLV rewrite), fetch-synced
with tiny output slices.
"""

import os
import sys
import time
import random
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops.fields import FR
from kzg_rust_tpu.utils.domain import compute_roots_of_unity


def fetch_time(fn, *args, reps=3):
    def sync(out):
        if isinstance(out, tuple):
            for o in out:
                np.asarray(o)
        else:
            np.asarray(out)

    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = random.Random(0xBA21)
    B, n = 64, 4096
    roots = compute_roots_of_unity(12)
    rr = FR.mont_r
    roots_m = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [(w * rr) % R for w in roots]))
    inv_n_m = jnp.asarray(L.int_to_limbs(FR.nlimbs, (pow(n, -1, R) * rr) % R))
    blob_np = np.frombuffer(
        b"".join(b"\x00" + rng.randbytes(31) for _ in range(B * n)), dtype=np.uint8
    ).reshape(B, n, 32)
    blob_dev = jax.device_put(jnp.asarray(blob_np))
    xs = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(B)]))
    np.asarray(blob_dev[0, 0])

    @jax.jit
    def stage_ingest(by):
        e = V.blob_bytes_to_limbs(by)
        ok = ~jnp.any(L.geq_mod(FR, e))
        return e[0, 0, :2], ok

    @jax.jit
    def stage_tomont(by):
        e = V.blob_bytes_to_limbs(by)
        em = L.to_mont(FR, e)
        return em[0, 0, :2]

    @jax.jit
    def stage_diff(by, x):
        e = V.blob_bytes_to_limbs(by)
        em = L.to_mont(FR, e)
        xm = L.to_mont(FR, x)
        d = L.sub_mod(FR, xm[:, None, :], jnp.broadcast_to(roots_m, em.shape))
        return d[0, 0, :2]

    @jax.jit
    def stage_inv(by, x):
        e = V.blob_bytes_to_limbs(by)
        em = L.to_mont(FR, e)
        xm = L.to_mont(FR, x)
        d = L.sub_mod(FR, xm[:, None, :], jnp.broadcast_to(roots_m, em.shape))
        inv = L.batch_mont_inv(FR, d, axis=1)
        return inv[0, 0, :2]

    @jax.jit
    def stage_full(by, x):
        ys, ok = V.bary_batch_from_bytes_kernel(n, roots_m, inv_n_m, by, x)
        return ys[0, :2], ok

    print(f"ingest+canon:   {fetch_time(stage_ingest, blob_dev)*1e3:8.1f} ms")
    print(f"+to_mont:       {fetch_time(stage_tomont, blob_dev)*1e3:8.1f} ms")
    print(f"+diff:          {fetch_time(stage_diff, blob_dev, xs)*1e3:8.1f} ms")
    print(f"+batch_inv:     {fetch_time(stage_inv, blob_dev, xs)*1e3:8.1f} ms")
    print(f"full bary:      {fetch_time(stage_full, blob_dev, xs)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
