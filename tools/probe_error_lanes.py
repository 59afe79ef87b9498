"""At-scale device error-path check at MAINNET width (VERDICT round-4
item 5): through the public API with the verify path forced to the device,
a batch of n>=512 mainnet blobs with exactly ONE corrupted element must
surface each failure lane through the chunked dispatches and the
packed-flag combines:

  (a) malformed compressed point      -> BadArgs "invalid compressed G1"
  (b) non-canonical blob field elem   -> BadArgs "Invalid Bytes32"
  (c) valid-encoding non-subgroup pt  -> BadArgs "not in right subgroup"
  (d) wrong-but-valid proof           -> False (no raise)
  (e) control: untampered batch       -> True

The bad lane sits near the END of the batch (last chunk) so a combine bug
that only honors chunk 0 would be caught.  Batches tile 64 distinct
host-proven triples (identical per-blob verification work; see bench.py).

Usage: python tools/probe_error_lanes.py [n]   (default 512)
Emits one JSON line per lane + a final summary.
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

from kzg_rust_tpu import Blob, Bytes48, Kzg
from kzg_rust_tpu.errors import BadArgs
from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import P, fp_sqrt
from kzg_rust_tpu.messages import (
    MSG_INVALID_BYTES32,
    MSG_INVALID_COMPRESSED_G1,
    MSG_NOT_IN_SUBGROUP,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BAD = N - 3  # inside the LAST chunk


def out_of_subgroup_compressed(rng) -> bytes:
    while True:
        x = rng.randrange(P)
        y = fp_sqrt((x * x * x + 4) % P)
        if y is None:
            continue
        pt = (x, y)
        if not gc.g1_in_subgroup(pt):
            return gc.g1_compress(pt)


def main():
    rng = random.Random(0xE121)
    print(json.dumps({"device": str(jax.devices()[0]), "n": N, "bad_lane": BAD}), flush=True)
    settings = Kzg.load_trusted_setup_file(
        os.path.join(ROOT, "data", "trusted_setup.txt")
    )
    fe = settings.preset.field_elements_per_blob
    blobs, cs, ps = [], [], []
    for _ in range(64):
        b = Blob(b"".join(b"\x00" + rng.randbytes(31) for _ in range(fe)))
        c = Kzg.blob_to_kzg_commitment(b, settings)
        ps.append(Kzg.compute_blob_kzg_proof(b, c, settings))
        blobs.append(b)
        cs.append(c)
    reps = (N + 63) // 64
    blobs, cs, ps = (blobs * reps)[:N], (cs * reps)[:N], (ps * reps)[:N]

    results = {}

    def lane(name, blobs2, cs2, ps2, expect):
        t0 = time.perf_counter()
        try:
            got = Kzg.verify_blob_kzg_proof_batch(blobs2, cs2, ps2, settings)
            outcome = got
        except BadArgs as e:
            outcome = f"BadArgs: {e}"
        dt = time.perf_counter() - t0
        ok = (
            outcome == expect
            if isinstance(expect, bool)
            else isinstance(outcome, str) and expect in outcome
        )
        results[name] = {"outcome": str(outcome), "expected": str(expect), "ok": ok}
        print(json.dumps({name: results[name], "s": round(dt, 2)}), flush=True)

    lane("control_valid", blobs, cs, ps, True)

    bad_cs = list(cs)
    bad_cs[BAD] = Bytes48(b"\x11" * 48)
    lane("malformed_point", blobs, bad_cs, ps, MSG_INVALID_COMPRESSED_G1)

    bad_blobs = list(blobs)
    bad_blobs[BAD] = Blob(b"\xff" * 32 + bytes(blobs[BAD])[32:])
    lane("noncanonical_blob", bad_blobs, cs, ps, MSG_INVALID_BYTES32)

    sub_cs = list(cs)
    sub_cs[BAD] = Bytes48(out_of_subgroup_compressed(rng))
    lane("non_subgroup_point", blobs, sub_cs, ps, MSG_NOT_IN_SUBGROUP)

    bad_ps = list(ps)
    bad_ps[BAD] = ps[BAD - 1]
    lane("wrong_valid_proof", blobs, cs, bad_ps, False)

    all_ok = all(r["ok"] for r in results.values())
    print(json.dumps({"summary": results, "all_ok": all_ok}), flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
