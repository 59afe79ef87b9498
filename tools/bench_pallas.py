"""Compare the Pallas Montgomery-mul kernel against the XLA limb pipeline.

Runs correctness (vs ops.limbs.mont_mul, itself golden-verified) and a
fetch-synced timing comparison at MSM-like widths on the attached device.

Usage: python tools/bench_pallas.py [--rows 262144]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262144)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from kzg_rust_tpu.ops import limbs as L
    from kzg_rust_tpu.ops import pallas_kernels as PK
    from kzg_rust_tpu.ops.fields import FP

    rng = random.Random(9)
    rows = args.rows
    a_int = [rng.randrange(FP.modulus) for _ in range(4096)]
    b_int = [rng.randrange(FP.modulus) for _ in range(4096)]
    a_small = jnp.asarray(L.ints_to_limbs(FP.nlimbs, a_int))
    b_small = jnp.asarray(L.ints_to_limbs(FP.nlimbs, b_int))

    # correctness on 4096 rows
    want = np.asarray(L.mont_mul(FP, a_small, b_small))
    got = np.asarray(PK.mont_mul_fp_pallas(a_small, b_small))
    assert (got == want).all(), "pallas mont_mul mismatch vs XLA path"
    print("pallas mont_mul matches XLA path on 4096 rows", flush=True)

    reps_rows = rows // 4096
    a_big = jnp.tile(a_small, (reps_rows, 1))
    b_big = jnp.tile(b_small, (reps_rows, 1))

    def timeit(label, fn, reps=5):
        out = fn(a_big, b_big)
        np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(a_big, b_big)
            np.asarray(out.ravel()[:1])
        print(
            f"{label:32s} {(time.perf_counter()-t0)/reps*1e3:8.2f}ms "
            f"({rows} rows)",
            flush=True,
        )

    timeit("XLA mont_mul", lambda x, y: L.mont_mul(FP, x, y))
    timeit("Pallas mont_mul", PK.mont_mul_fp_pallas)


if __name__ == "__main__":
    main()
