"""End-to-end tests for the batched device verification pipeline.

Runs the JaxBackend batch pipeline (subgroup kernel, batched barycentric,
fused RLC combination) on the MINIMAL preset with an insecure known-secret
setup, and cross-checks outcomes against the golden reference-shaped path
(reference flow: kzg.rs:637-693).
"""

from __future__ import annotations

import random

import pytest

from kzg_rust_tpu.api import Kzg
from kzg_rust_tpu.backends.golden_backend import GoldenBackend
from kzg_rust_tpu.backends.jax_backend import JaxBackend
from kzg_rust_tpu.errors import BadArgs
from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import P
from kzg_rust_tpu.presets import MINIMAL
from kzg_rust_tpu.types import Blob
from kzg_rust_tpu.utils.testing import make_insecure_setup

rng = random.Random(0xBA7C4)


@pytest.fixture(autouse=True)
def force_device_branch(monkeypatch):
    """These tests exist to exercise the DEVICE pipeline; without this the
    ``auto`` placement silently routes to the native host engine wherever
    it is built (caught in round 4 by the dispatch-count assertion in
    test_pipeline_chunked_barycentric — the outcome-only assertions passed
    on either path)."""
    monkeypatch.setenv("KZG_TPU_EVAL", "device")


@pytest.fixture(scope="module")
def settings():
    return make_insecure_setup(MINIMAL)


@pytest.fixture(scope="module")
def golden():
    return GoldenBackend()


@pytest.fixture(scope="module")
def jaxbe():
    return JaxBackend()


def make_blob(settings) -> Blob:
    n = settings.preset.field_elements_per_blob
    data = b"".join(b"\x00" + rng.randbytes(31) for _ in range(n))
    return Blob(data, bytes_per_blob=settings.preset.bytes_per_blob)


@pytest.fixture(scope="module")
def batch(settings, golden):
    blobs = [make_blob(settings) for _ in range(3)]
    cs = [Kzg.blob_to_kzg_commitment(b, settings, golden) for b in blobs]
    ps = [Kzg.compute_blob_kzg_proof(b, c, settings, golden) for b, c in zip(blobs, cs)]
    return blobs, cs, ps


def test_pipeline_accepts_valid_batch(settings, golden, jaxbe, batch):
    blobs, cs, ps = batch
    assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, golden) is True
    assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe) is True


def test_pipeline_rejects_swapped_proofs(settings, jaxbe, batch):
    blobs, cs, ps = batch
    swapped = [ps[1], ps[0], ps[2]]
    assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, swapped, settings, jaxbe) is False


def test_pipeline_rejects_noncanonical_blob(settings, jaxbe, batch):
    blobs, cs, ps = batch
    bad = Blob(
        b"\xff" * 32 + bytes(blobs[1])[32:],
        bytes_per_blob=settings.preset.bytes_per_blob,
    )
    with pytest.raises(BadArgs):
        Kzg.verify_blob_kzg_proof_batch([bad, blobs[1], blobs[2]], cs, ps, settings, jaxbe)


def _out_of_subgroup_compressed() -> bytes:
    """Compressed bytes of an on-curve point outside G1 (cofactor != 1)."""
    from kzg_rust_tpu.golden.field import fp_sqrt

    while True:
        x = rng.randrange(P)
        y = fp_sqrt((x * x * x + 4) % P)
        if y is None:
            continue
        pt = (x, y)
        if not gc.g1_in_subgroup(pt):
            return gc.g1_compress(pt)


def test_pipeline_rejects_out_of_subgroup_commitment(settings, jaxbe, batch):
    blobs, cs, ps = batch
    from kzg_rust_tpu.types import Bytes48

    bad_c = Bytes48(_out_of_subgroup_compressed())
    with pytest.raises(BadArgs):
        Kzg.verify_blob_kzg_proof_batch(
            blobs, [bad_c, cs[1], cs[2]], ps, settings, jaxbe
        )


def test_pipeline_matches_golden_on_tampered_blob(settings, golden, jaxbe, batch):
    """A valid-format but wrong blob must yield False (not raise) on both."""
    blobs, cs, ps = batch
    tampered = [make_blob(settings), blobs[1], blobs[2]]
    want = Kzg.verify_blob_kzg_proof_batch(tampered, cs, ps, settings, golden)
    got = Kzg.verify_blob_kzg_proof_batch(tampered, cs, ps, settings, jaxbe)
    assert got is want is False


def test_pipeline_batch_of_two(settings, golden, jaxbe, batch):
    """Exercises a different padded width than the 3-blob case."""
    blobs, cs, ps = batch
    assert (
        Kzg.verify_blob_kzg_proof_batch(blobs[:2], cs[:2], ps[:2], settings, jaxbe)
        is True
    )


def test_pipeline_chunked_barycentric(settings, golden, jaxbe, monkeypatch):
    """Large single-device batches dispatch the barycentric in fixed blob
    chunks and stage 1 in larger ones (measured 22% / 17% faster at
    n=4096, tools/probe_bary_chunks.py / probe_stage_chunks.py);
    the chunk boundary logic must be invisible: same accept/reject as the
    golden path, including a tampered blob landing in a LATER chunk."""
    import kzg_rust_tpu.backends.jax_backend as jb

    from kzg_rust_tpu.ops import verify_kernels as V

    monkeypatch.setattr(jb, "BARY_CHUNK_BLOBS", 4)
    monkeypatch.setattr(jb, "STAGE1_CHUNK_BLOBS", 4)
    calls = {"bary": 0, "stage1": 0}
    real_bary = V.bary_batch_from_bytes_kernel
    real_s1 = V.batch_points_kernel

    def count_bary(*a, **k):
        calls["bary"] += 1
        return real_bary(*a, **k)

    def count_s1(*a, **k):
        calls["stage1"] += 1
        return real_s1(*a, **k)

    monkeypatch.setattr(V, "bary_batch_from_bytes_kernel", count_bary)
    monkeypatch.setattr(V, "batch_points_kernel", count_s1)
    blobs = [make_blob(settings) for _ in range(9)]  # npad=16 -> 4 chunks
    cs = [Kzg.blob_to_kzg_commitment(b, settings, golden) for b in blobs]
    ps = [
        Kzg.compute_blob_kzg_proof(b, c, settings, golden)
        for b, c in zip(blobs, cs)
    ]
    assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe) is True
    # The chunked branches actually dispatched: 16/4 calls per stage.
    assert calls == {"bary": 4, "stage1": 4}
    tampered = list(blobs)
    tampered[7] = make_blob(settings)  # chunk 1 at width 4
    want = Kzg.verify_blob_kzg_proof_batch(tampered, cs, ps, settings, golden)
    got = Kzg.verify_blob_kzg_proof_batch(tampered, cs, ps, settings, jaxbe)
    assert got is want is False
    bad = Blob(
        b"\xff" * 32 + bytes(blobs[8])[32:],
        bytes_per_blob=settings.preset.bytes_per_blob,
    )
    noncanon = list(blobs)
    noncanon[8] = bad  # non-canonical element in the third chunk
    with pytest.raises(BadArgs):
        Kzg.verify_blob_kzg_proof_batch(noncanon, cs, ps, settings, jaxbe)


def test_pipeline_host_piecewise_mode(monkeypatch):
    """KZG_TPU_EVAL=host-piecewise (native barycentric + host RLC, no
    device) is a user-reachable placement mode; pin its accept/reject
    semantics on the mainnet setup.  Skipped where native is absent."""
    from kzg_rust_tpu import hostcrypto

    if hostcrypto._nat() is None:
        pytest.skip("native runtime not built")
    import pathlib

    from kzg_rust_tpu.backends.jax_backend import JaxBackend

    monkeypatch.setenv("KZG_TPU_EVAL", "host-piecewise")
    root = pathlib.Path(__file__).resolve().parent.parent
    mainnet = Kzg.load_trusted_setup_file(root / "data" / "trusted_setup.txt")
    be = JaxBackend()
    rng2 = random.Random(0x9EC3)
    blobs, cs, ps = [], [], []
    for _ in range(2):
        data = b"".join(b"\x00" + rng2.randbytes(31) for _ in range(4096))
        b = Blob(data)
        c = Kzg.blob_to_kzg_commitment(b, mainnet, be)
        p = Kzg.compute_blob_kzg_proof(b, c, mainnet, be)
        blobs.append(b)
        cs.append(c)
        ps.append(p)
    assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, mainnet, be) is True
    assert (
        Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps[::-1], mainnet, be) is False
    )
    with pytest.raises(BadArgs):
        Kzg.verify_blob_kzg_proof_batch(blobs, cs[:1], ps, mainnet, be)
