"""Conformance table-tests against the official c-kzg-4844 YAML vectors.

Pytest port of the reference's embedded harness (reference: src/lib.rs:14-204):
six glob-driven suites over ``tests/vectors/<suite>/*/*/data.yaml`` with the
three-way assert pattern:

  * input parse failure  => expected output must be null
  * op raises KzgError   => expected output must be null
  * op succeeds          => byte-exact / bool-exact match vs expected

All 208 vendored vectors must pass bit-exactly (SURVEY.md section 4).
"""

from __future__ import annotations

import glob

import pytest
import yaml

from kzg_rust_tpu import Blob, Bytes32, Bytes48, Kzg, KzgError

from .conftest import VECTOR_DIR


def _cases(suite: str):
    files = sorted(glob.glob(str(VECTOR_DIR / suite / "*" / "*" / "data.yaml")))
    assert files, f"no test vectors found for {suite}"
    return [pytest.param(f, id=f.rsplit("/", 2)[-2]) for f in files]


def _load(path: str):
    with open(path) as fh:
        return yaml.safe_load(fh)


@pytest.mark.parametrize("path", _cases("blob_to_kzg_commitment"))
def test_blob_to_kzg_commitment(path, settings, backend):
    # reference: lib.rs:31-53
    case = _load(path)
    expected = case["output"]
    try:
        blob = Blob.from_hex(case["input"]["blob"])
        commitment = Kzg.blob_to_kzg_commitment(blob, settings, backend)
    except KzgError:
        assert expected is None
        return
    assert expected is not None
    assert "0x" + commitment.hex() == expected


@pytest.mark.parametrize("path", _cases("compute_kzg_proof"))
def test_compute_kzg_proof(path, settings, backend):
    # reference: lib.rs:55-80 (output is the 2-tuple (proof, y))
    case = _load(path)
    expected = case["output"]
    try:
        blob = Blob.from_hex(case["input"]["blob"])
        z = Bytes32.from_hex(case["input"]["z"])
        proof, y = Kzg.compute_kzg_proof(blob, z, settings, backend)
    except KzgError:
        assert expected is None
        return
    assert expected is not None
    assert ["0x" + proof.hex(), "0x" + y.hex()] == list(expected)


@pytest.mark.parametrize("path", _cases("compute_blob_kzg_proof"))
def test_compute_blob_kzg_proof(path, settings, backend):
    # reference: lib.rs:82-106
    case = _load(path)
    expected = case["output"]
    try:
        blob = Blob.from_hex(case["input"]["blob"])
        commitment = Bytes48.from_hex(case["input"]["commitment"])
        proof = Kzg.compute_blob_kzg_proof(blob, commitment, settings, backend)
    except KzgError:
        assert expected is None
        return
    assert expected is not None
    assert "0x" + proof.hex() == expected


@pytest.mark.parametrize("path", _cases("verify_kzg_proof"))
def test_verify_kzg_proof(path, settings, backend):
    # reference: lib.rs:108-143
    case = _load(path)
    expected = case["output"]
    try:
        commitment = Bytes48.from_hex(case["input"]["commitment"])
        z = Bytes32.from_hex(case["input"]["z"])
        y = Bytes32.from_hex(case["input"]["y"])
        proof = Bytes48.from_hex(case["input"]["proof"])
        ok = Kzg.verify_kzg_proof(commitment, z, y, proof, settings, backend)
    except KzgError:
        assert expected is None
        return
    assert expected is not None
    assert ok == expected


@pytest.mark.parametrize("path", _cases("verify_blob_kzg_proof"))
def test_verify_blob_kzg_proof(path, settings, backend):
    # reference: lib.rs:145-176
    case = _load(path)
    expected = case["output"]
    try:
        blob = Blob.from_hex(case["input"]["blob"])
        commitment = Bytes48.from_hex(case["input"]["commitment"])
        proof = Bytes48.from_hex(case["input"]["proof"])
        ok = Kzg.verify_blob_kzg_proof(blob, commitment, proof, settings, backend)
    except KzgError:
        assert expected is None
        return
    assert expected is not None
    assert ok == expected


@pytest.mark.parametrize("path", _cases("verify_blob_kzg_proof_batch"))
def test_verify_blob_kzg_proof_batch(path, settings, backend):
    # reference: lib.rs:178-203
    case = _load(path)
    expected = case["output"]
    try:
        blobs = [Blob.from_hex(b) for b in case["input"]["blobs"]]
        commitments = [Bytes48.from_hex(c) for c in case["input"]["commitments"]]
        proofs = [Bytes48.from_hex(p) for p in case["input"]["proofs"]]
        ok = Kzg.verify_blob_kzg_proof_batch(blobs, commitments, proofs, settings, backend)
    except KzgError:
        assert expected is None
        return
    assert expected is not None
    assert ok == expected
