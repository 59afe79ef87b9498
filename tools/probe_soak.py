"""Soak the forced-device batch verifier: N consecutive batches, watching
for per-call drift (leaked device buffers or growing dispatch queues would
show as a monotonic slowdown) and reporting device memory stats.

Round 4 soaked n=64; round 5 adds the saturated shape (VERDICT round-4
item 8: at n=4096 each batch moves 537 MB of blobs + ~415 MB of stage-1
bases through HBM — ~80x the per-batch surface of the n=64 soak).  Large
batches tile 64 distinct blob/proof triples (identical per-blob work, see
bench.py).  Device memory stats are sampled every iteration so HBM growth
across batches is visible directly, not only via the timing drift proxy.

Usage: python tools/probe_soak.py [iters] [batch_n]   (default 30 64)
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
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
GEN = min(N, 64)


def _mem():
    try:
        stats = jax.devices()[0].memory_stats()
        return {
            k: stats[k]
            for k in ("bytes_in_use", "peak_bytes_in_use")
            if k in stats
        }
    except Exception:
        return None


def main():
    print(
        json.dumps({"device": str(jax.devices()[0]), "iters": ITERS, "n": N}),
        flush=True,
    )
    settings = Kzg.load_trusted_setup_file(
        os.path.join(ROOT, "data", "trusted_setup.txt")
    )
    fe = settings.preset.field_elements_per_blob
    rng = random.Random(0x50AC)
    blobs, cs, ps = [], [], []
    for _ in range(GEN):
        b = Blob(b"".join(b"\x00" + rng.randbytes(31) for _ in range(fe)))
        c = Kzg.blob_to_kzg_commitment(b, settings)
        ps.append(Kzg.compute_blob_kzg_proof(b, c, settings))
        blobs.append(b)
        cs.append(c)
    reps = (N + GEN - 1) // GEN
    blobs, cs, ps = (blobs * reps)[:N], (cs * reps)[:N], (ps * reps)[:N]
    assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings) is True  # warm
    times = []
    mems = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings) is True
        times.append(time.perf_counter() - t0)
        mems.append(_mem())
        print(
            json.dumps(
                {
                    "iter": i,
                    "ms": round(times[-1] * 1e3, 1),
                    "mem": mems[-1],
                }
            ),
            flush=True,
        )
    first = sum(times[: ITERS // 3]) / max(ITERS // 3, 1)
    last = sum(times[-(ITERS // 3) :]) / max(ITERS // 3, 1)
    in_use = [m["bytes_in_use"] for m in mems if m and "bytes_in_use" in m]
    print(
        json.dumps(
            {
                "mean_first_third_ms": round(first * 1e3, 1),
                "mean_last_third_ms": round(last * 1e3, 1),
                "drift_ratio": round(last / first, 3),
                "min_ms": round(min(times) * 1e3, 1),
                "max_ms": round(max(times) * 1e3, 1),
                "memory": mems[-1],
                "bytes_in_use_first": in_use[0] if in_use else None,
                "bytes_in_use_last": in_use[-1] if in_use else None,
                "hbm_growth_bytes": (in_use[-1] - in_use[0]) if len(in_use) > 1 else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
