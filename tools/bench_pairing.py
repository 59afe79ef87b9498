"""Device pairing vs host pairing — the wire-or-document measurement for
the batch verifier's single pairing check (reference: utils.rs:189-214).

The pairing is O(1) per batch; what matters is its latency relative to the
rest of the pipeline.  Measures the host path (native C++ when built, else
golden) and the device kernel (fetch-synced end-to-end, i.e. including the
link round trip a production call would pay).
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from kzg_rust_tpu.utils.observability import enable_compile_cache

enable_compile_cache()

from kzg_rust_tpu import hostcrypto
from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden import pairing as gp
from kzg_rust_tpu.ops import pairing as dp


def main():
    rng = random.Random(0xE2E2)
    # A true pairing equation: e(aG1, bG2) == e(abG1, G2).
    a, b = rng.randrange(1, gc.R), rng.randrange(1, gc.R)
    a1 = gc.g1_mul(gc.G1_GENERATOR, a)
    a2 = gc.g2_mul(gc.G2_GENERATOR, b)
    b1 = gc.g1_mul(gc.G1_GENERATOR, (a * b) % gc.R)
    b2 = gc.G2_GENERATOR

    assert hostcrypto.pairings_verify(a1, a2, b1, b2)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        ok = hostcrypto.pairings_verify(a1, a2, b1, b2)
        best = min(best, time.perf_counter() - t0)
        assert ok
    print(f"host pairings_verify:   {best*1e3:8.2f} ms")

    assert dp.pairings_verify_device(a1, a2, b1, b2)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        ok = dp.pairings_verify_device(a1, a2, b1, b2)
        best = min(best, time.perf_counter() - t0)
        assert ok
    print(f"device pairings_verify: {best*1e3:8.2f} ms (incl. link RTT)")


if __name__ == "__main__":
    main()
