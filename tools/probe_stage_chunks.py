"""Does blob-axis chunking also help stage 1 / stage 2 at n=4096?

Same method as tools/probe_bary_chunks.py: the total work dispatched as
C-blob chunks, fetch-synced once.  Stage 1 chunks along the point rows
(2 blobs per row pair); stage 2 chunks the digit lanes (6 per blob) with
the matching bases slices, combining the [2, 3, l] partials on host-free
device adds at the end.

Usage: python tools/probe_stage_chunks.py
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

from kzg_rust_tpu import Kzg
from kzg_rust_tpu.backends.jax_backend import JaxBackend, link_profile
from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import msm as M
from kzg_rust_tpu.ops import verify_kernels as V

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 4096
REPS = 4


def timed_best(run, rtt):
    run()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 0.0) * 1e3


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    settings = Kzg.load_trusted_setup_file(os.path.join(ROOT, "data", "trusted_setup.txt"))
    rng = random.Random(0x57A6E)
    rows = []
    for _ in range(N):
        p = gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R))
        q = gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R))
        rows.append(gc.g1_compress(p))
        rows.append(gc.g1_compress(q))
    comp_dev = jnp.asarray(
        np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(2 * N, 48)
    )
    np.asarray(comp_dev[0, 0])
    rtt, _ = link_profile()

    # --- stage 1 ---------------------------------------------------------
    for chunk in (N, 1024, 256):
        def s1():
            outs = [
                V.batch_points_kernel(comp_dev[2 * s : 2 * (s + chunk)])
                for s in range(0, N, chunk)
            ]
            np.asarray(outs[-1][2])

        print(
            json.dumps({"stage1_chunk": chunk, "ms": round(timed_best(s1, rtt), 1)}),
            flush=True,
        )

    # --- stage 2 ---------------------------------------------------------
    backend = JaxBackend()
    gen_table = backend._gen_table()
    syd = jnp.asarray(M.recode_signed_digits([12345], 1), dtype=jnp.int32)
    r_powers = [rng.randrange(R) for _ in range(N)]
    r_times_z = [rng.randrange(R) for _ in range(N)]
    digits = jnp.asarray(V.stage2_digits(N, r_powers, r_times_z))
    np.asarray(digits[0, 0])
    bases, bases2, _fl = V.batch_points_kernel(comp_dev)
    np.asarray(_fl)

    for chunk in (N, 1024, 256):
        def s2():
            outs = [
                V.batch_stage2_kernel(
                    bases[:, 2 * s : 2 * (s + chunk)],
                    bases2[:, 2 * s : 2 * (s + chunk)],
                    digits[:, 6 * s : 6 * (s + chunk)],
                    gen_table,
                    syd,
                )
                for s in range(0, N, chunk)
            ]
            np.asarray(outs[-1])

        print(
            json.dumps({"stage2_chunk": chunk, "ms": round(timed_best(s2, rtt), 1)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
