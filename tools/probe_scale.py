"""At-scale device measurements for the batch verifier (VERDICT round-4
item 1): e2e + per-stage device time at n in {64, 128, 512, 4096} on the
real chip, feeding the SCALING.md crossover table.

Per batch size:
  * builds a VALID batch with the native host prover (generation is not
    under measurement),
  * forces KZG_TPU_EVAL=device and times the public
    ``Kzg.verify_blob_kzg_proof_batch`` end to end (best/median of reps),
  * times each device stage kernel individually, fetch-synced best-of-k
    with the measured link RTT subtracted (at these widths the kernel
    times are 100s of ms, so +-10-30 ms RTT jitter is second-order; the
    chained-slope method of probe_bary.py is only needed for ~10 ms
    kernels).

Usage: python tools/probe_scale.py [n1 n2 ...]   (default: 64 128 512 4096)
Emits one JSON line per n plus a final summary JSON line.
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

import numpy as np
import jax
import jax.numpy as jnp

from kzg_rust_tpu import Blob, Kzg
from kzg_rust_tpu.backends.jax_backend import link_profile
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops.fields import FR

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
E2E_REPS = 5
KERNEL_REPS = 5


def fetch_timed(fn):
    """Dispatch + fetch-sync; returns seconds.  block_until_ready does not
    wait on this tunnel, so a real fetch is required — but it must be a
    TINY leaf: fetching a large output (e.g. stage 1's device-resident
    bases tensor) adds its full download time, which production never pays
    (only the flags come back).  The LAST tuple element of every probed
    kernel is its small output."""
    t0 = time.perf_counter()
    out = fn()
    leaf = out
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[-1]
    np.asarray(leaf)
    return time.perf_counter() - t0


def main():
    ns = [int(a) for a in sys.argv[1:]] or [64, 128, 512, 4096]
    settings = Kzg.load_trusted_setup_file(os.path.join(ROOT, "data", "trusted_setup.txt"))
    fe = settings.preset.field_elements_per_blob
    rng = random.Random(0x5CA1E)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rtt, bw = link_profile()
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 3), "h2d_MBps": round(bw / 1e6, 1)}), flush=True)

    nmax = max(ns)
    blobs, comms, proofs = [], [], []
    t0 = time.perf_counter()
    for _ in range(nmax):
        b = Blob(b"".join(b"\x00" + rng.randbytes(31) for _ in range(fe)))
        c = Kzg.blob_to_kzg_commitment(b, settings)
        p = Kzg.compute_blob_kzg_proof(b, c, settings)
        blobs.append(b)
        comms.append(c)
        proofs.append(p)
    print(json.dumps({"gen_s": round(time.perf_counter() - t0, 1), "n": nmax}), flush=True)

    summary = {}
    for n in ns:
        res = {"n": n}
        b, c, p = blobs[:n], comms[:n], proofs[:n]
        try:
            ok = Kzg.verify_blob_kzg_proof_batch(b, c, p, settings)  # warm/compile
            assert ok is True
            samples = []
            for _ in range(E2E_REPS):
                t = time.perf_counter()
                assert Kzg.verify_blob_kzg_proof_batch(b, c, p, settings) is True
                samples.append(time.perf_counter() - t)
            samples.sort()
            res["e2e_best_ms"] = round(samples[0] * 1e3, 1)
            res["e2e_median_ms"] = round(samples[len(samples) // 2] * 1e3, 1)
            res["e2e_blobs_per_s"] = round(n / samples[0], 1)
        except Exception as e:  # OOM at the largest sizes is a finding, not a crash
            res["e2e_error"] = f"{type(e).__name__}: {e}"[:200]

        # --- per-stage kernels at this width (resident inputs) ------------
        try:
            inf48 = b"\xc0" + b"\x00" * 47
            rows = []
            for i in range(n):
                rows.append(bytes(c[i]))
                rows.append(bytes(p[i]))
            comp = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(2 * n, 48)
            comp_dev = jnp.asarray(comp)
            np.asarray(comp_dev[0, 0])  # upload sync

            from kzg_rust_tpu.backends.jax_backend import STAGE1_CHUNK_BLOBS

            def stage1():
                # Mirrors the production dispatch (chunked above threshold).
                if n >= 2 * STAGE1_CHUNK_BLOBS:
                    import jax.numpy as _jnp

                    parts = [
                        V.batch_points_kernel(
                            comp_dev[2 * s : 2 * (s + STAGE1_CHUNK_BLOBS)]
                        )
                        for s in range(0, n, STAGE1_CHUNK_BLOBS)
                    ]
                    bases = _jnp.concatenate([p[0] for p in parts], axis=1)
                    bases2 = _jnp.concatenate([p[1] for p in parts], axis=1)
                    flags = _jnp.min(_jnp.stack([p[2] for p in parts]), axis=0)
                    # Tie the tiny fetched leaf to BOTH concats so their
                    # cost (which production's stage 2 pays) is awaited
                    # without downloading the bases.
                    dep = (bases[0, 0, 0, 0] + bases2[0, 0, 0, 0]) >> 31
                    return bases, bases2, flags + dep
                return V.batch_points_kernel(comp_dev)

            t1 = min(fetch_timed(stage1) for _ in range(2))  # compile+warm
            t1 = min(fetch_timed(stage1) for _ in range(KERNEL_REPS))
            res["stage1_ms"] = round(max(t1 - rtt, 0.0) * 1e3, 1)
            bases, bases2, _fl = V.batch_points_kernel(comp_dev)

            blob_arr = np.frombuffer(
                b"".join(bytes(x) for x in b), dtype=np.uint8
            ).reshape(n, fe, 32)
            blob_dev = jnp.asarray(blob_arr)
            np.asarray(blob_dev[0, 0, 0])
            from kzg_rust_tpu.backends.jax_backend import JaxBackend

            backend = JaxBackend()
            ctx = backend._fr_ctx(settings)
            xs = [rng.randrange(FR.modulus) for _ in range(n)]
            xs_dev = jnp.asarray(L.ints_to_limbs(FR.nlimbs, xs))

            from kzg_rust_tpu.backends.jax_backend import BARY_CHUNK_BLOBS

            def bary():
                # Mirrors the production dispatch: chunked above the
                # 2*BARY_CHUNK_BLOBS threshold (jax_backend), one full
                # width dispatch below it.
                if n >= 2 * BARY_CHUNK_BLOBS:
                    parts = [
                        V.bary_batch_from_bytes_kernel(
                            ctx.n,
                            ctx.roots_m,
                            ctx.roots_m2,
                            ctx.inv_n_m,
                            blob_dev[s : s + BARY_CHUNK_BLOBS],
                            xs_dev[s : s + BARY_CHUNK_BLOBS],
                        )
                        for s in range(0, n, BARY_CHUNK_BLOBS)
                    ]
                    return parts[-1]
                return V.bary_batch_from_bytes_kernel(
                    ctx.n, ctx.roots_m, ctx.roots_m2, ctx.inv_n_m, blob_dev, xs_dev
                )

            tb = min(fetch_timed(bary) for _ in range(2))
            tb = min(fetch_timed(bary) for _ in range(KERNEL_REPS))
            res["bary_ms"] = round(max(tb - rtt, 0.0) * 1e3, 1)

            from kzg_rust_tpu.golden.field import R as _R
            from kzg_rust_tpu.ops import msm as M

            r_powers = [rng.randrange(_R) for _ in range(n)]
            r_times_z = [rng.randrange(_R) for _ in range(n)]
            digits = jnp.asarray(V.stage2_digits(n, r_powers, r_times_z))
            np.asarray(digits[0, 0])
            gen_table = backend._gen_table()
            syd = jnp.asarray(M.recode_signed_digits([12345], 1), dtype=jnp.int32)

            def stage2():
                return V.batch_stage2_kernel(bases, bases2, digits, gen_table, syd)

            t2 = min(fetch_timed(stage2) for _ in range(2))
            t2 = min(fetch_timed(stage2) for _ in range(KERNEL_REPS))
            res["stage2_ms"] = round(max(t2 - rtt, 0.0) * 1e3, 1)
            ksum = (res["stage1_ms"] + res["bary_ms"] + res["stage2_ms"]) / 1e3
            res["kernel_sum_ms"] = round(ksum * 1e3, 1)
            res["kernel_blobs_per_s"] = round(n / ksum, 1)
        except Exception as e:
            res["kernel_error"] = f"{type(e).__name__}: {e}"[:200]

        print(json.dumps(res), flush=True)
        summary[n] = res
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
