"""Raw-bytes input validation at the protocol layer.

The reference enforces input sizes through its typed wrappers (Blob,
Bytes32; kzg.rs:101-178).  This API also accepts plain ``bytes``, so the
protocol layer itself must hold the same line: wrong-length blobs and
scalars raise KzgError on every backend instead of being silently
zero-padded, truncated, or misinterpreted (code-review findings)."""

import pytest

from kzg_rust_tpu.api import Kzg
from kzg_rust_tpu.backends import get_backend
from kzg_rust_tpu.errors import KzgError
from kzg_rust_tpu.presets import MINIMAL
from kzg_rust_tpu.utils.testing import make_insecure_setup


@pytest.fixture(scope="module")
def env():
    settings = make_insecure_setup(MINIMAL)
    blob = b"".join(i.to_bytes(32, "big") for i in (5, 6, 7, 8))
    c = Kzg.blob_to_kzg_commitment(blob, settings, backend=get_backend("golden"))
    return settings, blob, c


@pytest.mark.parametrize("backend", ["golden", "jax"])
def test_short_blob_raises(env, backend):
    settings, _, _ = env
    be = get_backend(backend)
    with pytest.raises(KzgError):
        Kzg.blob_to_kzg_commitment(b"\x01" * 64, settings, backend=be)
    with pytest.raises(KzgError):
        Kzg.compute_kzg_proof(b"\x01" * 64, (7).to_bytes(32, "big"), settings, backend=be)


@pytest.mark.parametrize("backend", ["golden", "jax"])
def test_wrong_length_scalars_raise(env, backend):
    settings, blob, c = env
    be = get_backend(backend)
    proof, y = Kzg.compute_kzg_proof(blob, (7).to_bytes(32, "big"), settings, backend=be)
    with pytest.raises(KzgError):
        Kzg.compute_kzg_proof(blob, b"\x01", settings, backend=be)
    with pytest.raises(KzgError):
        Kzg.verify_kzg_proof(c, b"\x01", bytes(y), bytes(proof), settings, backend=be)
    with pytest.raises(KzgError):
        Kzg.verify_kzg_proof(
            c, (7).to_bytes(32, "big"), b"\x02" * 31, bytes(proof), settings, backend=be
        )


def test_cache_roundtrip_and_corruption(tmp_path, monkeypatch):
    # A corrupted cache entry must fall back to re-decompression, not crash;
    # an unwritable cache dir must not fail the load.
    import os

    from kzg_rust_tpu.utils.testing import write_insecure_setup_file
    from kzg_rust_tpu.settings import load_trusted_setup_file

    setup_file = tmp_path / "setup.txt"
    write_insecure_setup_file(setup_file, MINIMAL)

    cache_dir = tmp_path / "cache"
    monkeypatch.setenv("KZG_TPU_CACHE_DIR", str(cache_dir))
    s1 = load_trusted_setup_file(str(setup_file), MINIMAL)
    entries = list(cache_dir.glob("setup-*.npz"))
    assert len(entries) == 1
    # corrupt the npz: load must still succeed (fallback path)
    entries[0].write_bytes(b"garbage")
    s2 = load_trusted_setup_file(str(setup_file), MINIMAL)
    assert s2.g1_values == s1.g1_values
    # swap in a structurally-valid npz holding forged points: the cache-hit
    # revalidation must reject it (off-curve G1) and use the real inputs
    from kzg_rust_tpu.settings import _points_to_cache, _setup_cache_path

    forged_g1 = list(s1.g1_values)
    forged_g1[0] = (12345, 67890)  # not on the curve
    # reconstruct the exact cache path the loader will use
    lines = setup_file.read_text().splitlines()
    n1, n2 = int(lines[0]), int(lines[1])
    g1_bytes = b"".join(bytes.fromhex(h) for h in lines[2 : 2 + n1])
    g2_bytes = b"".join(bytes.fromhex(h) for h in lines[2 + n1 : 2 + n1 + n2])
    path = _setup_cache_path(g1_bytes, g2_bytes, MINIMAL)
    _points_to_cache(path, forged_g1, s2.g2_values)
    s3 = load_trusted_setup_file(str(setup_file), MINIMAL)
    assert s3.g1_values == s1.g1_values  # forged entry rejected, real load used

    # unwritable cache dir: load still succeeds
    os.chmod(cache_dir, 0o500)
    try:
        s4 = load_trusted_setup_file(str(setup_file), MINIMAL)
        assert s4.g1_values == s1.g1_values
    finally:
        os.chmod(cache_dir, 0o700)
