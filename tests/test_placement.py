"""Auto-placement host-cost calibration (VERDICT round-3 item 4 +
round-4 review hardening).

The ``auto`` placement compares a measured link cost against a host
runtime budget.  Round 3 hard-coded this host's figures; round 4 measures
them at runtime — lazily, per (component, preset): the verify slope needs
no prover context, and a process mixing presets must not let the first
preset consulted poison placement for the others.
"""

from __future__ import annotations

import pytest

from kzg_rust_tpu.backends import jax_backend as jb


@pytest.fixture()
def fresh_profile(monkeypatch):
    """Reset the process-wide host profile cache around each test."""
    monkeypatch.setattr(jb, "_HOST_PROFILE", {})
    yield


def _native_available() -> bool:
    from kzg_rust_tpu import hostcrypto

    return hostcrypto._nat() is not None


def test_host_profile_fallback_without_native(fresh_profile):
    assert jb.host_verify_profile(None, 131072) == jb.AUTO_HOST_PER_BLOB_S
    assert jb.host_prove_profile(None, 131072) == jb.AUTO_HOST_PROVE_S


@pytest.mark.skipif(not _native_available(), reason="native runtime not built")
def test_host_profiles_measured_with_native(fresh_profile, settings):
    backend = jb.JaxBackend()
    bpb = settings.preset.bytes_per_blob
    per_blob = jb.host_verify_profile(backend._verify_native_ctx(settings), bpb)
    prove = jb.host_prove_profile(backend._prover_native_ctx(settings), bpb)
    assert 0 < per_blob < 1.0
    assert 0 < prove < 10.0
    assert per_blob != jb.AUTO_HOST_PER_BLOB_S
    assert prove != jb.AUTO_HOST_PROVE_S
    # Cached once per (component, preset).
    assert jb.host_verify_profile(backend._verify_native_ctx(settings), bpb) == per_blob
    assert ("verify", bpb) in jb._HOST_PROFILE
    assert ("prove", bpb) in jb._HOST_PROFILE


@pytest.mark.skipif(not _native_available(), reason="native runtime not built")
def test_host_profile_keys_by_preset(fresh_profile):
    """Round-4 review finding: a single process-wide profile let the first
    preset consulted (e.g. MINIMAL's microsecond blobs) poison the budget
    for every other preset.  The cache keys by bytes_per_blob."""
    jb._HOST_PROFILE[("verify", 128)] = 1e-9  # pretend minimal was measured
    assert jb.host_verify_profile(None, 131072) == jb.AUTO_HOST_PER_BLOB_S
    assert jb._HOST_PROFILE[("verify", 128)] == 1e-9  # untouched


def test_verify_profile_needs_no_prover_ctx(fresh_profile, settings):
    """Verify-only processes must not build the fixed-base prover table
    just to calibrate: the verify component is measured from the verify
    ctx alone (on a well-formed but failing batch)."""
    if not _native_available():
        pytest.skip("native runtime not built")
    backend = jb.JaxBackend()
    per_blob = jb.host_verify_profile(
        backend._verify_native_ctx(settings), settings.preset.bytes_per_blob
    )
    assert per_blob > 0
    # The prove component stays unmeasured until a prover op consults it.
    assert ("prove", settings.preset.bytes_per_blob) not in jb._HOST_PROFILE


def test_auto_budget_uses_measured_host_costs(fresh_profile, settings, monkeypatch):
    """The decision inequality sees the measured budget: with the host
    measured as instant, the device can never win; with the host measured
    as enormous, a (mocked) fast link picks the device."""
    backend = jb.JaxBackend()

    class FakeJax:
        @staticmethod
        def default_backend():
            return "tpu"

    monkeypatch.setattr(jb, "_LINK_PROFILE", (10e-6, 10e9))  # 10us RTT, 10GB/s
    import sys

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    bpb = settings.preset.bytes_per_blob

    monkeypatch.setitem(jb._HOST_PROFILE, ("verify", bpb), 1e-9)
    monkeypatch.setitem(jb._HOST_PROFILE, ("prove", bpb), 1e-9)
    assert not backend._auto_prefers_device(settings, 64, 64 * 131168, "verify_batch")

    monkeypatch.setitem(jb._HOST_PROFILE, ("verify", bpb), 10.0)
    monkeypatch.setitem(jb._HOST_PROFILE, ("prove", bpb), 10.0)
    assert backend._auto_prefers_device(settings, 64, 64 * 131168, "verify_batch")
    assert backend._auto_prefers_device(settings, 1, 131072, "prover")


def test_auto_prices_device_compute(fresh_profile, settings, monkeypatch):
    """VERDICT round-4 item 3: a fast link does NOT imply device — the
    inequality carries a measured device-compute term, so a fast link
    attached to a chip measurably slower than the host keeps the batch on
    the host.  Numbers below are the shipped measurements: host 9,600
    blobs/s at n=4096 (104 us/blob) vs device ~3,900 blobs/s/chip
    (fixed 11.8 ms + 255 us/blob) — auto must pick the HOST even at
    zero link cost, and flip to the device when the device model says the
    chip is faster than the host."""
    backend = jb.JaxBackend()

    class FakeJax:
        @staticmethod
        def default_backend():
            return "tpu"

    monkeypatch.setattr(jb, "_LINK_PROFILE", (10e-6, 100e9))  # near-free link
    import sys

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    bpb = settings.preset.bytes_per_blob

    # Host measured at the bench host's n=4096 rate: 104 us/blob.
    monkeypatch.setitem(jb._HOST_PROFILE, ("verify", bpb), 104e-6)
    n, upload = 4096, 4096 * 131168
    assert not backend._auto_prefers_device(settings, n, upload, "verify_batch")

    # Same fast link, host 4x slower than the measured device model: device.
    monkeypatch.setitem(jb._HOST_PROFILE, ("verify", bpb), 1e-3)
    assert backend._auto_prefers_device(settings, n, upload, "verify_batch")

    # Env override models a faster accelerator generation: device wins
    # against the capable host too.
    monkeypatch.setitem(jb._HOST_PROFILE, ("verify", bpb), 104e-6)
    monkeypatch.setenv("KZG_TPU_DEVICE_FIXED_MS", "1")
    monkeypatch.setenv("KZG_TPU_DEVICE_PER_BLOB_US", "10")
    jb._HOST_PROFILE.pop(("device_verify",), None)
    assert backend._auto_prefers_device(settings, n, upload, "verify_batch")
    jb._HOST_PROFILE.pop(("device_verify",), None)


def test_device_profile_defaults_and_override(fresh_profile, monkeypatch):
    assert jb.device_verify_profile() == (
        jb.AUTO_DEVICE_FIXED_S,
        jb.AUTO_DEVICE_PER_BLOB_S,
    )
    jb._HOST_PROFILE.pop(("device_verify",), None)
    monkeypatch.setenv("KZG_TPU_DEVICE_FIXED_MS", "not-a-number")
    assert jb.device_verify_profile() == (
        jb.AUTO_DEVICE_FIXED_S,
        jb.AUTO_DEVICE_PER_BLOB_S,
    )  # unparseable override falls back to the measured model
    assert jb.device_est(1, "prover") == jb.AUTO_DEVICE_PROVE_S


def test_host_calibration_failure_falls_back(fresh_profile):
    """Round-4 advisor finding: calibration runs inside a user's first
    auto-placed call, so a calibration-only error must fall back to the
    frozen constants, never propagate out of the legitimate request."""

    class ExplodingCtx:
        def verify_scatter(self, *a):
            raise RuntimeError("calibration-only failure")

        def commit(self, *a):
            raise RuntimeError("calibration-only failure")

    assert jb.host_verify_profile(ExplodingCtx(), 131072) == jb.AUTO_HOST_PER_BLOB_S
    assert jb.host_prove_profile(ExplodingCtx(), 131072) == jb.AUTO_HOST_PROVE_S


def test_chunked_regime_overlap_model(fresh_profile, settings, monkeypatch):
    """Round-5 review finding: the chunked-barycentric pipeline interleaves
    the blob upload with chunk compute, so for n >= 2*BARY_CHUNK_BLOBS the
    placement combines link and device terms as max(), not a sum — an
    additive model would double-count the transfer and reject the device
    on exactly the fast-link saturated batches the interleave speeds up.
    Small batches keep the additive model (one upload, fully serialized)."""
    backend = jb.JaxBackend()

    class FakeJax:
        @staticmethod
        def default_backend():
            return "tpu"

    import sys

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    monkeypatch.setattr(jb, "_LINK_PROFILE", (10e-6, 500e6))  # 500 MB/s
    monkeypatch.setenv("KZG_TPU_DEVICE_FIXED_MS", "10")
    monkeypatch.setenv("KZG_TPU_DEVICE_PER_BLOB_US", "233")
    jb._HOST_PROFILE.pop(("device_verify",), None)
    bpb = settings.preset.bytes_per_blob

    # n=4096 (chunked regime): upload ~1.07 s, device ~0.96 s.  Host at
    # 366 us/blob -> 1.50 s budget sits BETWEEN max(1.07) and sum(2.04):
    # the overlap model must pick the device.
    monkeypatch.setitem(jb._HOST_PROFILE, ("verify", bpb), 366e-6)
    n, upload = 4096, 4096 * (bpb + 96)
    assert backend._auto_prefers_device(settings, n, upload, "verify_batch")

    # n=64 (below the chunked regime): upload ~16.8 ms + device ~24.9 ms
    # sum to ~42 ms.  Host at 500 us/blob -> 32 ms budget sits between
    # max(24.9) and the sum: the additive model must keep the host.
    monkeypatch.setitem(jb._HOST_PROFILE, ("verify", bpb), 500e-6)
    n, upload = 64, 64 * (bpb + 96)
    assert not backend._auto_prefers_device(settings, n, upload, "verify_batch")
    jb._HOST_PROFILE.pop(("device_verify",), None)
