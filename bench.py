"""Round benchmark: north-star metric, production path.

Measures ``verify_blob_kzg_proof_batch`` throughput (blobs/s) on the mainnet
preset through the product's default placement — the reference's headline
benchmark (reference: benches/kzg_benches.rs:93-126, Throughput::Elements)
scaled to its largest criterion batch size (n=64).  Prints ONE JSON line.

Placement: ``KZG_TPU_EVAL`` is NOT pinned here.  ``auto`` measures the
host<->device link once and picks the device pipeline exactly when the
link is PCIe-class; on this environment's tunneled chip (measured ~23 ms
RTT, ~80 MB/s upload — SCALING.md "Link placement") it selects the native
host engine, which is the correct production decision for this topology:
one n=64 batch cannot physically cross this link faster than the host
verifies it outright.  Set KZG_TPU_EVAL=device to force the TPU pipeline;
its kernel-level numbers are in SCALING.md "Device pipeline" and
tools/bench_device.py reproduces them.

``vs_baseline``: the reference publishes no numbers (BASELINE.json
``"published": {}``) and no Rust toolchain exists here to measure it, so the
denominator is a documented estimate of blst-backed single-thread batch
verification on server-class x86: ~2.5 ms/blob in large batches => ~400
blobs/s (public c-kzg-4844 / blst criterion results).  vs_baseline > 1 means
faster than that estimate.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_BLOBS_PER_S = 400.0  # documented estimate, see module docstring
BATCH_N = 64  # reference's largest criterion batch size
# The bench host's effective CPU speed oscillates 2-6x on a seconds scale
# (hypervisor contention); best-of-many with a spacing sleep samples enough
# distinct windows that the reported number reflects the machine, not the
# neighbors.
REPEATS = 25
SPACING_S = 0.25


def random_blob(rng: random.Random, n_fe: int) -> bytes:
    # Canonical field elements: zero the top byte (reference: benches:14-23).
    return b"".join(b"\x00" + rng.randbytes(31) for _ in range(n_fe))


def main() -> None:
    os.environ.setdefault("KZG_TPU_BACKEND", "jax")
    import jax

    # Persist compiled executables: the limb-tensor graphs are compile-heavy
    # and identical across runs, so repeat invocations skip XLA entirely.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from kzg_rust_tpu import Blob, Kzg

    settings = Kzg.load_trusted_setup_file(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "trusted_setup.txt")
    )
    n_fe = settings.preset.field_elements_per_blob

    rng = random.Random(0xBEEF)
    blobs, commitments, proofs = [], [], []
    for _ in range(BATCH_N):
        blob = Blob(random_blob(rng, n_fe))
        c = Kzg.blob_to_kzg_commitment(blob, settings)
        p = Kzg.compute_blob_kzg_proof(blob, c, settings)
        blobs.append(blob)
        commitments.append(c)
        proofs.append(p)

    # Warm-up (compile + cache all jitted paths).
    assert Kzg.verify_blob_kzg_proof_batch(blobs, commitments, proofs, settings) is True

    best = float("inf")
    for i in range(REPEATS):
        if i:
            time.sleep(SPACING_S)
        t0 = time.perf_counter()
        ok = Kzg.verify_blob_kzg_proof_batch(blobs, commitments, proofs, settings)
        dt = time.perf_counter() - t0
        assert ok is True
        best = min(best, dt)

    blobs_per_s = BATCH_N / best
    print(
        json.dumps(
            {
                "metric": f"verify_blob_kzg_proof_batch throughput (n={BATCH_N}, mainnet)",
                "value": round(blobs_per_s, 2),
                "unit": "blobs/s",
                "vs_baseline": round(blobs_per_s / BASELINE_BLOBS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
