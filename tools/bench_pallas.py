"""Compare the Pallas fused kernels against the XLA limb pipeline.

Correctness (vs ops.limbs / ops.curve, themselves golden-verified) plus a
fetch-synced timing comparison at MSM-like widths on the attached device.
This is the adopt-or-delete measurement for the KZG_TPU_PALLAS knob.

Usage: python tools/bench_pallas.py [--rows 8192] [--reps 5]
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
    ap.add_argument("--rows", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kzg_rust_tpu.utils.observability import enable_compile_cache

    enable_compile_cache()

    from kzg_rust_tpu.golden import curve as gc
    from kzg_rust_tpu.ops import curve as C
    from kzg_rust_tpu.ops import limbs as L
    from kzg_rust_tpu.ops import pallas_kernels as PK
    from kzg_rust_tpu.ops.fields import FP

    rng = random.Random(9)
    rows = args.rows

    from functools import partial
    from jax import lax

    def fetch_time(fn, *a):
        np.asarray(fn(*a))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    def chain_time(make_step, x, steps_a=16, steps_b=64):
        """Per-step cost via differential chained timing with a TINY output
        fetch (full-output fetches ride a ~MB/s D2H path on this tunnel and
        would drown the comparison; see SCALING.md 'Link placement')."""

        @partial(jax.jit, static_argnums=1)
        def chain(v, steps):
            def step(acc, _):
                return make_step(acc), None

            out = lax.scan(step, v, None, length=steps)[0]
            return out.reshape(-1)[:4]

        ta = fetch_time(chain, x, steps_a)
        tb = fetch_time(chain, x, steps_b)
        return (tb - ta) / (steps_b - steps_a)

    # --- correctness on a small slice
    small = 512
    a_int = [rng.randrange(FP.modulus) for _ in range(small)]
    b_int = [rng.randrange(FP.modulus) for _ in range(small)]
    a_s = jnp.asarray(L.ints_to_limbs(FP.nlimbs, a_int))
    b_s = jnp.asarray(L.ints_to_limbs(FP.nlimbs, b_int))
    got = np.asarray(PK.mont_mul_fp_pallas(a_s, b_s))
    want = np.asarray(L.mont_mul(FP, a_s, b_s))
    assert (got == want).all(), "pallas mont_mul mismatch"
    print(f"correctness OK at rows={small}")

    # --- big-batch data (replicated small slice; values irrelevant to speed)
    reps_r = rows // small
    a_b = jnp.asarray(np.tile(np.asarray(a_s), (reps_r, 1)))
    b_b = jnp.asarray(np.tile(np.asarray(b_s), (reps_r, 1)))

    t_x = chain_time(lambda acc: L.mont_mul(FP, acc, acc), a_b)
    t_p = chain_time(lambda acc: PK.mont_mul_fp_pallas(acc, acc), a_b)
    print(
        f"mont_mul rows={rows}: XLA {t_x*1e6:8.1f} us ({rows/t_x/1e9:.3f} Gmul/s)"
        f"  Pallas {t_p*1e6:8.1f} us ({rows/t_p/1e9:.3f} Gmul/s)  speedup {t_x/t_p:5.2f}x"
    )

    # --- fused point add / double
    base = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(256)]
    p_s = jnp.asarray(C.points_to_proj(base))
    q_s = jnp.asarray(C.points_to_proj(base[::-1]))
    got = np.asarray(PK.proj_add_pallas(p_s, q_s))
    want = np.asarray(C.proj_add(p_s, q_s))
    assert (got == want).all(), "pallas proj_add mismatch"
    got = np.asarray(PK.proj_double_pallas(p_s))
    want = np.asarray(C.proj_double(p_s))
    assert (got == want).all(), "pallas proj_double mismatch"
    print("point-op correctness OK")

    prows = max(rows // 2, 256)
    p_b = jnp.asarray(np.tile(np.asarray(p_s), (prows // 256, 1, 1)))

    t_x = chain_time(C.proj_double, p_b)
    t_p = chain_time(PK.proj_double_pallas, p_b)
    print(
        f"proj_dbl rows={prows}: XLA {t_x*1e6:8.1f} us  Pallas {t_p*1e6:8.1f} us"
        f"  speedup {t_x/t_p:5.2f}x"
    )
    t_x = chain_time(lambda acc: C.proj_add(acc, acc), p_b)
    t_p = chain_time(lambda acc: PK.proj_add_pallas(acc, acc), p_b)
    print(
        f"proj_add rows={prows}: XLA {t_x*1e6:8.1f} us  Pallas {t_p*1e6:8.1f} us"
        f"  speedup {t_x/t_p:5.2f}x"
    )


if __name__ == "__main__":
    main()
