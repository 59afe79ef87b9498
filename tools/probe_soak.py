"""Soak the forced-device batch verifier: N consecutive batches, watching
for per-call drift (leaked device buffers or growing dispatch queues would
show as a monotonic slowdown) and reporting device memory stats.

Usage: python tools/probe_soak.py [iters]   (default 30)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["KZG_TPU_BACKEND"] = "jax"
os.environ["KZG_TPU_EVAL"] = "device"
os.environ["KZG_TPU_PROVER"] = "host"

from kzg_rust_tpu.utils.observability import enable_compile_cache

enable_compile_cache()

import jax

from kzg_rust_tpu import Blob, Kzg

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
N = 64


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "iters": ITERS, "n": N}), flush=True)
    settings = Kzg.load_trusted_setup_file(os.path.join(ROOT, "data", "trusted_setup.txt"))
    fe = settings.preset.field_elements_per_blob
    rng = random.Random(0x50AC)
    blobs, cs, ps = [], [], []
    for _ in range(N):
        b = Blob(b"".join(b"\x00" + rng.randbytes(31) for _ in range(fe)))
        c = Kzg.blob_to_kzg_commitment(b, settings)
        ps.append(Kzg.compute_blob_kzg_proof(b, c, settings))
        blobs.append(b)
        cs.append(c)
    assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings) is True  # warm
    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings) is True
        times.append(time.perf_counter() - t0)
    first = sum(times[: ITERS // 3]) / (ITERS // 3)
    last = sum(times[-(ITERS // 3) :]) / (ITERS // 3)
    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        mem = {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use") if k in stats}
    except Exception:
        pass
    print(
        json.dumps(
            {
                "mean_first_third_ms": round(first * 1e3, 1),
                "mean_last_third_ms": round(last * 1e3, 1),
                "drift_ratio": round(last / first, 3),
                "min_ms": round(min(times) * 1e3, 1),
                "max_ms": round(max(times) * 1e3, 1),
                "memory": mem,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
