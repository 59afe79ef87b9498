"""Device batch-verify pipeline benchmark on the attached chip.

End-to-end through the public API with KZG_TPU_EVAL=device, plus a
stage-by-stage breakdown of the same pipeline so link costs (upload, RTT)
and device compute are separately visible.  All timings fetch-synced.

Usage: python tools/bench_device.py [n_blobs ...]
"""

import os
import sys
import time
import random

os.environ.setdefault("KZG_TPU_BACKEND", "jax")
os.environ["KZG_TPU_EVAL"] = "device"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kzg_rust_tpu.utils.observability import enable_compile_cache

enable_compile_cache()

from kzg_rust_tpu import Blob, Kzg
from kzg_rust_tpu.backends import get_backend


def main():
    ns = [int(a) for a in sys.argv[1:]] or [64]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    settings = Kzg.load_trusted_setup_file(os.path.join(root, "data", "trusted_setup.txt"))
    n_fe = settings.preset.field_elements_per_blob
    rng = random.Random(0xBEEF)

    nmax = max(ns)
    print(f"generating {nmax} blobs+proofs (native prover)...", flush=True)
    blobs, comms, proofs = [], [], []
    for _ in range(nmax):
        blob = Blob(b"".join(b"\x00" + rng.randbytes(31) for _ in range(n_fe)))
        c = Kzg.blob_to_kzg_commitment(blob, settings)
        p = Kzg.compute_blob_kzg_proof(blob, c, settings)
        blobs.append(blob)
        comms.append(c)
        proofs.append(p)

    be = get_backend("jax")
    for n in ns:
        bl, cs, ps = blobs[:n], comms[:n], proofs[:n]
        # warm (compile)
        assert Kzg.verify_blob_kzg_proof_batch(bl, cs, ps, settings, be) is True
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ok = Kzg.verify_blob_kzg_proof_batch(bl, cs, ps, settings, be)
            best = min(best, time.perf_counter() - t0)
            assert ok
        print(f"n={n:4d}: e2e device path {best*1e3:8.1f} ms -> {n/best:8.1f} blobs/s")

    # Stage breakdown at the largest n.
    n = nmax
    bl, cs, ps = blobs[:n], comms[:n], proofs[:n]
    from kzg_rust_tpu.golden import curve as gcurve
    from kzg_rust_tpu.golden.field import R
    from kzg_rust_tpu.ops import curve as C
    from kzg_rust_tpu.ops import limbs as L
    from kzg_rust_tpu.ops import msm as M
    from kzg_rust_tpu.ops import verify_kernels as V
    from kzg_rust_tpu.ops.fields import FR
    from kzg_rust_tpu.utils import bls_serde as serde
    from kzg_rust_tpu.backends.jax_backend import _hash_pool, _pow2_pad

    preset = settings.preset
    npad = _pow2_pad(n, lo=4)
    pad = npad - n

    def run_once():
        t = {}
        T0 = time.perf_counter()
        inf48 = b"\xc0" + b"\x00" * 47
        rows = []
        for i in range(n):
            rows.append(bytes(cs[i]))
            rows.append(bytes(ps[i]))
        rows.extend([inf48] * (2 * pad))
        comp = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(2 * npad, 48)
        t["comp build (host)"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        bases, bases2, pflags = V.batch_points_kernel(jnp.asarray(comp))
        t["points dispatch (async)"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        blob_dev = be._blob_bytes_dev(settings, bl)
        if pad:
            blob_dev = jnp.concatenate(
                [blob_dev, jnp.zeros((pad,) + blob_dev.shape[1:], jnp.uint8)]
            )
        t["blob upload dispatch (async)"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        preimages = [
            serde.challenge_preimage(preset, bytes(bl[i]), bytes(cs[i]))
            for i in range(n)
        ]
        zs = list(_hash_pool().map(serde.hash_to_bls_field_sha, preimages))
        t["sha challenges (host)"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        ctx = be._fr_ctx(settings)
        xs_arr = L.ints_to_limbs(FR.nlimbs, list(zs) + [0] * pad)
        ys_dev, blob_ok = V.bary_batch_from_bytes_kernel(
            ctx.n, ctx.roots_m, ctx.roots_m2, ctx.inv_n_m, blob_dev, jnp.asarray(xs_arr)
        )
        t["bary dispatch (async)"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        flags = np.asarray(pflags)
        t["points flags fetch (sync: chain done)"] = time.perf_counter() - T0
        assert flags[0] and flags[1]

        T0 = time.perf_counter()
        ok = bool(np.asarray(blob_ok))
        ys = L.limbs_to_ints(np.asarray(ys_dev)[:n])
        t["ys fetch (sync: bary done)"] = time.perf_counter() - T0
        assert ok

        T0 = time.perf_counter()
        r_powers = serde.compute_r_powers(preset, cs, zs, ys, ps)
        r_times_z = [(r_powers[i] * zs[i]) % R for i in range(n)]
        ry = sum(rp * y for rp, y in zip(r_powers, ys)) % R
        t["r-powers (host sha)"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        digits = V.stage2_digits(npad, r_powers + [0] * pad, r_times_z + [0] * pad)
        sy_digits = M.recode_signed_digits([ry], 1)
        t["glv recode (host)"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        out = V.batch_stage2_kernel(
            bases, bases2, jnp.asarray(digits),
            be._gen_table(), jnp.asarray(sy_digits, dtype=jnp.int32),
        )
        out_h = np.asarray(out)
        t["stage2 dispatch+fetch"] = time.perf_counter() - T0

        T0 = time.perf_counter()
        lhs, rhs = C.proj_to_points(out_h)
        okp = be.pairings_verify(lhs, settings.g2_values[1], rhs, gcurve.G2_GENERATOR)
        t["pairing (host)"] = time.perf_counter() - T0
        assert okp
        return t

    run_once()  # warm
    for rep in range(3):
        t = run_once()
        total = sum(t.values())
        print(f"--- breakdown rep {rep}: total {total*1e3:.1f} ms")
        for k, v in t.items():
            print(f"  {k:42s} {v*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
