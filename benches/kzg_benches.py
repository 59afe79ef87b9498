"""Criterion-equivalent benchmark suite.

Mirrors the reference's bench set (reference: benches/kzg_benches.rs:25-130):
the five single-op latencies plus the ``verify_blob_kzg_proof_batch``
throughput group over n in {1, 2, 4, 8, 16, 32, 64}.  Inputs are random
canonical blobs (first byte of each field element zeroed, reference:
benches:14-23) against the real mainnet setup.

Usage:  python benches/kzg_benches.py [--backend jax|golden] [--repeats N]
Prints one human line per bench plus a final JSON array on stdout.
``--verbose`` enables the library's structured DEBUG logging (setup-load
phase timings); setting ``KZG_TPU_TRACE_DIR=<dir>`` additionally captures a
JAX profiler trace of the whole run for TensorBoard.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=os.environ.get("KZG_TPU_BACKEND", "jax"))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--batch-sizes", default="1,2,4,8,16,32,64")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    os.environ["KZG_TPU_BACKEND"] = args.backend
    if args.verbose:
        import logging

        logging.basicConfig(
            level=logging.DEBUG, format="%(asctime)s %(name)s %(message)s"
        )
        logging.getLogger("jax").setLevel(logging.INFO)

    if args.backend == "jax":
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg")
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from kzg_rust_tpu import Blob, Bytes32, Kzg

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    settings = Kzg.load_trusted_setup_file(os.path.join(root, "data", "trusted_setup.txt"))
    n_fe = settings.preset.field_elements_per_blob
    rng = random.Random(0xBE7C4)

    def rblob() -> Blob:
        return Blob(b"".join(b"\x00" + rng.randbytes(31) for _ in range(n_fe)))

    results = []

    def bench(name: str, fn, repeats=args.repeats, throughput_elems=None):
        fn()  # warm-up (compiles on the jax backend)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        best = min(times)
        med = statistics.median(times)
        row = {"bench": name, "best_s": round(best, 6), "median_s": round(med, 6)}
        if throughput_elems:
            row["elements_per_s"] = round(throughput_elems / best, 2)
        results.append(row)
        extra = f"  {row.get('elements_per_s', '')} elem/s" if throughput_elems else ""
        print(f"{name:44s} best {best*1e3:9.2f}ms  median {med*1e3:9.2f}ms{extra}", flush=True)

    blob = rblob()
    commitment = Kzg.blob_to_kzg_commitment(blob, settings)
    z = Bytes32((7).to_bytes(32, "big"))
    proof, y = Kzg.compute_kzg_proof(blob, z, settings)
    blob_proof = Kzg.compute_blob_kzg_proof(blob, commitment, settings)

    # reference: benches/kzg_benches.rs:46-48
    bench("blob_to_kzg_commitment", lambda: Kzg.blob_to_kzg_commitment(blob, settings))
    # reference: benches:50-58
    bench("compute_kzg_proof", lambda: Kzg.compute_kzg_proof(blob, z, settings))
    # reference: benches:60-68
    bench(
        "compute_blob_kzg_proof",
        lambda: Kzg.compute_blob_kzg_proof(blob, commitment, settings),
    )
    # reference: benches:70-80
    bench(
        "verify_kzg_proof",
        lambda: Kzg.verify_kzg_proof(commitment, z, y, proof, settings),
    )
    # reference: benches:82-91
    bench(
        "verify_blob_kzg_proof",
        lambda: Kzg.verify_blob_kzg_proof(blob, commitment, blob_proof, settings),
    )

    # reference: benches:93-126 (Throughput::Elements)
    sizes = [int(s) for s in args.batch_sizes.split(",")]
    max_n = max(sizes)
    blobs = [rblob() for _ in range(max_n)]
    commitments = [Kzg.blob_to_kzg_commitment(b, settings) for b in blobs]
    proofs = [
        Kzg.compute_blob_kzg_proof(b, c, settings) for b, c in zip(blobs, commitments)
    ]
    for n in sizes:
        bench(
            f"verify_blob_kzg_proof_batch/{n}",
            lambda n=n: Kzg.verify_blob_kzg_proof_batch(
                blobs[:n], commitments[:n], proofs[:n], settings
            ),
            throughput_elems=n,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    from kzg_rust_tpu.utils.observability import device_trace

    with device_trace():  # XLA profile when KZG_TPU_TRACE_DIR is set
        main()
