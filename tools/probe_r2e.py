"""Probe 5: stage-by-stage timing of the device batch-verify pipeline."""

import os
import sys
import time
import random

os.environ["KZG_TPU_BACKEND"] = "jax"
os.environ["KZG_TPU_EVAL"] = "device"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from kzg_rust_tpu import Blob, Kzg
from kzg_rust_tpu import hostcrypto
from kzg_rust_tpu.backends import get_backend as _backend
from kzg_rust_tpu.golden import curve as gcurve
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import msm as M
from kzg_rust_tpu.ops import verify_kernels as V
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops.fields import FR
from kzg_rust_tpu.utils import bls_serde as serde
from kzg_rust_tpu.backends.jax_backend import _hash_pool, _pow2_pad

settings = Kzg.load_trusted_setup_file(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "trusted_setup.txt")
)
n_fe = settings.preset.field_elements_per_blob
rng = random.Random(0xBEEF)
blobs, comms, proofs = [], [], []
for _ in range(64):
    blob = Blob(b"".join(b"\x00" + rng.randbytes(31) for _ in range(n_fe)))
    c = Kzg.blob_to_kzg_commitment(blob, settings)
    p = Kzg.compute_blob_kzg_proof(blob, c, settings)
    blobs.append(blob); comms.append(c); proofs.append(p)

be = _backend("jax")
preset = settings.preset
n = 64

def run_once(tag=""):
    t = {}
    T0 = time.perf_counter()
    points = hostcrypto.g1_uncompress_batch([bytes(b) for b in comms] + [bytes(b) for b in proofs])
    commitments, proof_pts = points[:n], points[n:]
    t["uncompress(host)"] = time.perf_counter() - T0

    T0 = time.perf_counter()
    blob_dev = be._blob_bytes_dev(settings, blobs)
    blob_dev.block_until_ready()
    t["blob upload"] = time.perf_counter() - T0

    T0 = time.perf_counter()
    preimages = [serde.challenge_preimage(preset, bytes(blobs[i]), bytes(comms[i])) for i in range(n)]
    zs = list(_hash_pool().map(serde.hash_to_bls_field_sha, preimages))
    t["sha challenges(host)"] = time.perf_counter() - T0

    root_index = be._root_index(settings)
    xs_eval = list(zs)

    T0 = time.perf_counter()
    ys = be._prepare_batch(settings, points, blob_dev, xs_eval)
    t["prepare(subgrp+bary) dispatch+fetch"] = time.perf_counter() - T0

    T0 = time.perf_counter()
    r_powers = serde.compute_r_powers(preset, comms, zs, ys, proofs)
    r_times_z = [(r_powers[i] * zs[i]) % R for i in range(n)]
    t["r-powers(host)"] = time.perf_counter() - T0

    T0 = time.perf_counter()
    npad = _pow2_pad(n, lo=4)
    pad = npad - n
    cpts = C.points_to_proj(commitments + [None] * pad)
    ppts = C.points_to_proj(proof_pts + [None] * pad)
    r_bits = V.scalars_to_bits(r_powers + [0] * pad)
    rz_bits = V.scalars_to_bits(r_times_z + [0] * pad)
    y_digits = M.recode_signed_digits(ys + [0] * pad, npad)
    t["host recode/convert"] = time.perf_counter() - T0

    T0 = time.perf_counter()
    out = V.batch_core_kernel(
        jnp.asarray(cpts), jnp.asarray(ppts), be._gen_table(), npad,
        jnp.asarray(r_bits), jnp.asarray(rz_bits), jnp.asarray(y_digits, dtype=jnp.int32),
    )
    out_h = np.asarray(out)
    t["batch_core dispatch+fetch"] = time.perf_counter() - T0

    T0 = time.perf_counter()
    proof_lincomb, rhs_g1 = C.proj_to_points(out_h)
    ok = be.pairings_verify(proof_lincomb, settings.g2_values[1], rhs_g1, gcurve.G2_GENERATOR)
    t["pairing(host)"] = time.perf_counter() - T0
    assert ok
    return t

run_once()  # warm/compile
for rep in range(3):
    t = run_once()
    total = sum(t.values())
    print(f"--- rep {rep}: total {total*1e3:.1f} ms")
    for k, v in t.items():
        print(f"  {k:38s} {v*1e3:8.1f} ms")
