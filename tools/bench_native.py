"""Quick latency bench for the native host-crypto runtime.

Times the fused prover calls (commit / prove / blob-proof; reference:
benches/kzg_benches.rs:46-68) and host-mode batch verification
(benches:93-126) straight at the ctypes boundary, bypassing the Python
protocol layer, so kernel-level changes in native/kzg_native.cpp are
directly visible.

Usage: python tools/bench_native.py [--repeats N] [--batch N,N,...]
"""

from __future__ import annotations

import argparse
import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("KZG_TPU_BACKEND", "golden")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--batch", default="64")
    args = ap.parse_args()

    from kzg_rust_tpu import Blob, Kzg
    from kzg_rust_tpu import native as kn

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    settings = Kzg.load_trusted_setup_file(os.path.join(root, "data", "trusted_setup.txt"))
    n_fe = settings.preset.field_elements_per_blob
    rng = random.Random(0xBE7C4)

    if not kn.available():
        print("native runtime unavailable", file=sys.stderr)
        sys.exit(1)

    def rblob() -> bytes:
        return b"".join(b"\x00" + rng.randbytes(31) for _ in range(n_fe))

    from kzg_rust_tpu.presets import FIAT_SHAMIR_PROTOCOL_DOMAIN

    prover = kn.ProverCtx(
        settings.roots_of_unity, settings.g1_values, FIAT_SHAMIR_PROTOCOL_DOMAIN
    )

    def bench(name, fn, repeats=args.repeats):
        fn()
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        print(
            f"{name:34s} best {min(times)*1e3:8.2f}ms  "
            f"median {statistics.median(times)*1e3:8.2f}ms",
            flush=True,
        )

    blob = rblob()
    comm48 = kn.g1_compress(prover.commit(blob))
    z = (7).to_bytes(32, "big")

    bench("prover.commit (4096-pt MSM)", lambda: prover.commit(blob))
    bench("prover.prove", lambda: prover.prove(blob, z))
    bench("prover.blob_proof", lambda: prover.blob_proof(blob, comm48))

    # Fused native batch verification (what the jax backend's host mode
    # dispatches to, kzg_rust_tpu/backends/jax_backend.py).
    from kzg_rust_tpu.golden import curve as gcurve
    from kzg_rust_tpu.presets import RANDOM_CHALLENGE_KZG_BATCH_DOMAIN

    vctx = kn.VerifyCtx(
        settings.roots_of_unity,
        settings.g2_values[1],
        gcurve.G2_GENERATOR,
        FIAT_SHAMIR_PROTOCOL_DOMAIN,
        RANDOM_CHALLENGE_KZG_BATCH_DOMAIN,
    )
    for nb in [int(x) for x in args.batch.split(",") if x]:
        blobs, comms, proofs = [], [], []
        for _ in range(nb):
            b = rblob()
            cpt = prover.commit(b)
            c48 = kn.g1_compress(cpt)
            ppt = prover.blob_proof(b, c48)
            blobs.append(b)
            comms.append(c48)
            proofs.append(kn.g1_compress(ppt))
        cat_blobs = b"".join(blobs)
        cat_comms = b"".join(comms)
        cat_proofs = b"".join(proofs)
        ok = vctx.verify(cat_blobs, nb, cat_comms, cat_proofs)
        assert ok is True, "fused batch verify rejected valid batch"
        bench(
            f"native verify_blob_batch n={nb}",
            lambda: vctx.verify(cat_blobs, nb, cat_comms, cat_proofs),
            repeats=max(3, args.repeats // 2),
        )


if __name__ == "__main__":
    main()
