"""Measure whether chunked blob uploads interleaved with barycentric chunk
dispatches beat the shipped monolithic upload at n=4096 (VERDICT round-4
item 9).

The shipped pipeline uploads the full [4096, 4096, 32] blob tensor
(537 MB) in one ``jnp.asarray`` and then dispatches the 128-blob
barycentric chunks against device-side slices; the upload therefore
serializes ahead of the first chunk dispatch.  If the runtime can overlap
host->device transfer of chunk k+1 with compute on chunk k, interleaving
per-chunk uploads with per-chunk dispatches shortens the tunnel
end-to-end — worthless for the per-chip compute anchor, but it is the
number a tunneled deployment sees.  This probe times both schedules
identically (fetch-synced on the packed result), plus an upload-only
baseline for each granularity.

Usage: python tools/probe_upload_overlap.py [n_blobs] [reps]
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

from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops.fields import FR
from kzg_rust_tpu.utils.domain import compute_roots_of_unity

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DOMAIN = 4096
CHUNK = 128


def main():
    rng = random.Random(0x0B5E)
    print(json.dumps({"device": str(jax.devices()[0]), "n": N}), flush=True)

    roots = compute_roots_of_unity(12)
    rr = FR.mont_r
    roots_m = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [(w * rr) % R for w in roots]))
    roots_m2 = jnp.asarray(
        L.ints_to_limbs(FR.nlimbs, [(w * rr * rr) % R for w in roots])
    )
    inv_n_m = jnp.asarray(L.int_to_limbs(FR.nlimbs, (pow(DOMAIN, -1, R) * rr) % R))

    # Host-side blob bytes, canonical elements ([N, 4096, 32] uint8).
    base = np.frombuffer(
        b"".join(
            b"\x00" + rng.randbytes(31) for _ in range(64 * DOMAIN)
        ),
        dtype=np.uint8,
    ).reshape(64, DOMAIN, 32)
    blob_np = np.ascontiguousarray(np.tile(base, ((N + 63) // 64, 1, 1))[:N])
    xs_np = L.ints_to_limbs(FR.nlimbs, [rng.randrange(R) for _ in range(N)])
    xs_dev = jax.device_put(jnp.asarray(xs_np))
    np.asarray(xs_dev[0])

    def fetch(parts):
        packed = jnp.concatenate(
            [jnp.stack([p[1] for p in parts]).astype(jnp.uint32).reshape(-1)]
            + [p[0].reshape(-1) for p in parts]
        )
        return np.asarray(packed)

    def monolithic():
        blob_dev = jnp.asarray(blob_np)
        parts = [
            V.bary_batch_from_bytes_kernel(
                DOMAIN, roots_m, roots_m2, inv_n_m,
                blob_dev[s : s + CHUNK], xs_dev[s : s + CHUNK],
            )
            for s in range(0, N, CHUNK)
        ]
        return fetch(parts)

    def interleaved(step=CHUNK):
        parts = []
        for s in range(0, N, step):
            chunk_dev = jnp.asarray(blob_np[s : s + step])
            for t in range(0, step, CHUNK):
                parts.append(
                    V.bary_batch_from_bytes_kernel(
                        DOMAIN, roots_m, roots_m2, inv_n_m,
                        chunk_dev[t : t + CHUNK], xs_dev[s + t : s + t + CHUNK],
                    )
                )
        return fetch(parts)

    def upload_only():
        blob_dev = jnp.asarray(blob_np)
        return np.asarray(blob_dev[0, 0, :1])

    def upload_only_chunked(step=CHUNK):
        outs = [jnp.asarray(blob_np[s : s + step]) for s in range(0, N, step)]
        return np.asarray(outs[-1][0, 0, :1])

    results = {}
    for name, fn in (
        ("upload_only_monolithic", upload_only),
        ("upload_only_chunk128", upload_only_chunked),
        ("upload_only_chunk1024", lambda: upload_only_chunked(1024)),
        ("monolithic_e2e", monolithic),
        ("interleaved128_e2e", interleaved),
        ("interleaved1024_e2e", lambda: interleaved(1024)),
    ):
        fn()  # warm: compile + first transfer
        best = float("inf")
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            samples.append(round(dt, 2))
            best = min(best, dt)
        results[name + "_s"] = round(best, 2)
        print(json.dumps({name: samples, "best_s": round(best, 2)}), flush=True)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
