"""Minimal-preset conformance: the golden-generated vector corpus
(tests/vectors_minimal/, built by tools/gen_minimal_vectors.py) through the
same three-way harness as the mainnet suite, against the committed insecure
minimal setup file (data/trusted_setup_minimal.txt).

This locks the minimal preset (reference README.md:8-9 promises it; the
reference code never shipped it) and gives the device path a fixed
small-width conformance surface (SURVEY.md section 4, implication (b)).
"""

from __future__ import annotations

import glob
import pathlib

import pytest
import yaml

from kzg_rust_tpu import Blob, Bytes32, Bytes48, Kzg, KzgError
from kzg_rust_tpu.presets import MINIMAL

from .conftest import REPO_ROOT, backend_name

VEC = REPO_ROOT / "tests" / "vectors_minimal"
SETUP = REPO_ROOT / "data" / "trusted_setup_minimal.txt"


@pytest.fixture(scope="module")
def msettings():
    return Kzg.load_trusted_setup_file(SETUP, MINIMAL)


@pytest.fixture(scope="module", params=["default", "jax-device"])
def backend(request):
    """Run the whole minimal corpus twice: once on the configured default
    backend, once FORCING the jax device branch (KZG_TPU_EVAL/PROVER=device)
    so the device kernels' conformance is gated on every run even where the
    native runtime builds (VERDICT round 1: the device branch was otherwise
    only reachable behind an opt-in env var)."""
    from kzg_rust_tpu.backends import get_backend

    if request.param == "jax-device":
        mp = pytest.MonkeyPatch()
        mp.setenv("KZG_TPU_EVAL", "device")
        mp.setenv("KZG_TPU_PROVER", "device")
        request.addfinalizer(mp.undo)
        from kzg_rust_tpu.backends.jax_backend import JaxBackend

        return JaxBackend()
    return get_backend(backend_name())


def _cases():
    files = sorted(glob.glob(str(VEC / "*" / "*" / "*" / "data.yaml")))
    assert files, "no minimal vectors; run tools/gen_minimal_vectors.py"
    return [
        pytest.param(f, id="/".join(f.rsplit("/", 4)[-4:-1])) for f in files
    ]


def _blob(h: str) -> Blob:
    return Blob.from_hex(h, bytes_per_blob=MINIMAL.bytes_per_blob)


@pytest.mark.parametrize("path", _cases())
def test_minimal_vector(path, msettings, backend):
    with open(path) as fh:
        case = yaml.safe_load(fh)
    suite = pathlib.Path(path).parts[-4]
    inp, expected = case["input"], case["output"]
    try:
        if suite == "blob_to_kzg_commitment":
            got = "0x" + Kzg.blob_to_kzg_commitment(_blob(inp["blob"]), msettings, backend).hex()
        elif suite == "compute_kzg_proof":
            proof, y = Kzg.compute_kzg_proof(
                _blob(inp["blob"]), Bytes32.from_hex(inp["z"]), msettings, backend
            )
            got = ["0x" + proof.hex(), "0x" + y.hex()]
        elif suite == "compute_blob_kzg_proof":
            got = "0x" + Kzg.compute_blob_kzg_proof(
                _blob(inp["blob"]), Bytes48.from_hex(inp["commitment"]), msettings, backend
            ).hex()
        elif suite == "verify_kzg_proof":
            got = Kzg.verify_kzg_proof(
                Bytes48.from_hex(inp["commitment"]),
                Bytes32.from_hex(inp["z"]),
                Bytes32.from_hex(inp["y"]),
                Bytes48.from_hex(inp["proof"]),
                msettings,
                backend,
            )
        elif suite == "verify_blob_kzg_proof":
            got = Kzg.verify_blob_kzg_proof(
                _blob(inp["blob"]),
                Bytes48.from_hex(inp["commitment"]),
                Bytes48.from_hex(inp["proof"]),
                msettings,
                backend,
            )
        elif suite == "verify_blob_kzg_proof_batch":
            got = Kzg.verify_blob_kzg_proof_batch(
                [_blob(h) for h in inp["blobs"]],
                [Bytes48.from_hex(h) for h in inp["commitments"]],
                [Bytes48.from_hex(h) for h in inp["proofs"]],
                msettings,
                backend,
            )
        else:  # pragma: no cover
            pytest.fail(f"unknown suite {suite}")
    except KzgError:
        assert expected is None
        return
    assert expected is not None
    assert got == expected
