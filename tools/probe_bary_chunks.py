"""Does chunking the blob axis speed the barycentric kernel at n=4096?

probe_scale.py measured 0.155 ms/blob at width 64 vs 0.197 ms/blob at
width 4096 — the [4096 x 4096 x 22] working set is deep in the
memory-bound regime.  This probe times the same total work dispatched as
C-blob chunks (one async dispatch per chunk, fetch-synced once at the
end) for C in {4096, 1024, 512, 128, 64}.

Usage: python tools/probe_bary_chunks.py
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
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops.fields import FR

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 4096
REPS = 4


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    settings = Kzg.load_trusted_setup_file(os.path.join(ROOT, "data", "trusted_setup.txt"))
    fe = settings.preset.field_elements_per_blob
    rng = random.Random(0xCB0C)
    blob_arr = np.frombuffer(
        b"".join(b"\x00" + rng.randbytes(31) for _ in range(N * fe)), dtype=np.uint8
    ).reshape(N, fe, 32)
    blob_dev = jnp.asarray(blob_arr)
    np.asarray(blob_dev[0, 0, 0])  # upload sync
    backend = JaxBackend()
    ctx = backend._fr_ctx(settings)
    xs_dev = jnp.asarray(
        L.ints_to_limbs(FR.nlimbs, [rng.randrange(FR.modulus) for _ in range(N)])
    )
    rtt, _bw = link_profile()

    for chunk in (4096, 1024, 512, 128, 64):
        def run():
            oks = []
            for s in range(0, N, chunk):
                ys, ok = V.bary_batch_from_bytes_kernel(
                    ctx.n,
                    ctx.roots_m,
                    ctx.roots_m2,
                    ctx.inv_n_m,
                    blob_dev[s : s + chunk],
                    xs_dev[s : s + chunk],
                )
                oks.append(ok)
            np.asarray(oks[-1])  # one fetch-sync at the end

        run()  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {"chunk": chunk, "total_ms": round(max(best - rtt, 0) * 1e3, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
