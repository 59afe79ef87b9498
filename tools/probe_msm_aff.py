"""Measure the batched-affine MSM fold variants on the real chip
(VERDICT round-4 item 3): the mainnet fixed-base GLV MSM with
aff_levels in {0, 1, 2, 3} Montgomery-batched affine pre-reduction levels,
timed by the chained-iteration-slope method (tools/probe_bary.py) so the
tunnel's +-10-30 ms RTT jitter cancels — the kernel itself is ~22 ms.

Each variant is also checked against the golden naive lincomb.

Usage: python tools/probe_msm_aff.py [k_lo k_hi]   (default 2 6)
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
from functools import partial

from kzg_rust_tpu import Kzg
from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import msm as M

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K_LO, K_HI = (int(a) for a in sys.argv[1:3]) if len(sys.argv) > 2 else (2, 6)


def fetch(v):
    np.asarray(v)


@partial(jax.jit, static_argnums=(4, 5, 6))
def chained(table, inf_mask, d1, d2, fold: int, aff: int, iters: int):
    out0 = jnp.zeros((3, table.shape[-1]), jnp.uint32)

    def body(i, carry):
        d1c, _ = carry
        out = M._msm_core_glv(table, inf_mask, d1c, d2, fold, aff)
        dep = (out[0, 0] >> 31).astype(jnp.int32)  # always 0, unfoldable
        return (d1c + dep, out)

    return lax.fori_loop(0, iters, body, (d1, out0))[1]


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    settings = Kzg.load_trusted_setup_file(os.path.join(ROOT, "data", "trusted_setup.txt"))
    rng = random.Random(0xAFFA)
    scalars = [rng.randrange(R) for _ in range(settings.preset.field_elements_per_blob)]
    want = gc.g1_lincomb_pippenger(settings.g1_values, scalars)

    t0 = time.perf_counter()
    ctx = M.MsmContext.build(settings)
    print(json.dumps({"table_build_s": round(time.perf_counter() - t0, 1)}), flush=True)

    d1h, d2h = M.recode_glv_host(scalars)
    d1 = jnp.asarray(d1h, dtype=jnp.int32)
    d2 = jnp.asarray(d2h, dtype=jnp.int32)

    for aff in (0, 1, 2, 3):
        # correctness
        out = M._msm_glv_kernel(ctx.table, ctx.inf_mask, d1, d2, ctx.fold, aff)
        got = C.proj_to_points(np.asarray(out)[None])[0]
        okstr = "ok" if got == want else "MISMATCH"
        # chained slope
        fetch(chained(ctx.table, ctx.inf_mask, d1, d2, ctx.fold, aff, K_LO))
        t_lo = min(
            _t(lambda: fetch(chained(ctx.table, ctx.inf_mask, d1, d2, ctx.fold, aff, K_LO)))
            for _ in range(3)
        )
        fetch(chained(ctx.table, ctx.inf_mask, d1, d2, ctx.fold, aff, K_HI))
        t_hi = min(
            _t(lambda: fetch(chained(ctx.table, ctx.inf_mask, d1, d2, ctx.fold, aff, K_HI)))
            for _ in range(3)
        )
        slope_ms = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
        print(
            json.dumps(
                {"aff_levels": aff, "msm_ms": round(slope_ms, 2), "check": okstr}
            ),
            flush=True,
        )


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
