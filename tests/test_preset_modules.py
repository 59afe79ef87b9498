"""The kzg_mainnet / kzg_minimal preset namespaces.

The reference README promises preset modules ``kzg_mainnet`` and
``kzg_minimal`` (reference: README.md:8-9); these tests pin the drop-in
surface: preset-bound Blob validation, loader defaults, and a full
commit/prove/verify round-trip per preset on an insecure known-secret setup.
"""

import pytest

from kzg_rust_tpu import kzg_mainnet, kzg_minimal
from kzg_rust_tpu.errors import InvalidBytesLength
from kzg_rust_tpu.types import Bytes32
from kzg_rust_tpu.utils.testing import make_insecure_setup


@pytest.mark.parametrize("mod", [kzg_mainnet, kzg_minimal], ids=["mainnet", "minimal"])
def test_blob_length_bound_to_preset(mod):
    blob = mod.Blob(b"\x00" * mod.BYTES_PER_BLOB)
    assert len(blob) == mod.BYTES_PER_BLOB
    with pytest.raises(InvalidBytesLength):
        mod.Blob(b"\x00" * (mod.BYTES_PER_BLOB - 32))


@pytest.mark.parametrize("mod", [kzg_mainnet, kzg_minimal], ids=["mainnet", "minimal"])
def test_blob_from_bytes_and_from_hex(mod):
    raw = b"\x00" * mod.BYTES_PER_BLOB
    assert isinstance(mod.Blob.from_bytes(bytearray(raw)), mod.Blob)
    assert isinstance(mod.Blob.from_hex("0x" + raw.hex()), mod.Blob)


def test_loader_keyword_matches_base_kzg(tmp_path):
    # Keyword call sites written against the base Kzg must port verbatim.
    from kzg_rust_tpu.utils.testing import write_insecure_setup_file

    path = tmp_path / "s.txt"
    write_insecure_setup_file(path, kzg_minimal.PRESET)
    st = kzg_minimal.Kzg.load_trusted_setup_file(str(path), preset=kzg_minimal.PRESET)
    assert st.preset.field_elements_per_blob == 4


def test_mainnet_minimal_lengths_differ():
    assert kzg_mainnet.FIELD_ELEMENTS_PER_BLOB == 4096
    assert kzg_minimal.FIELD_ELEMENTS_PER_BLOB == 4
    assert kzg_mainnet.Kzg.PRESET is not kzg_minimal.Kzg.PRESET


def test_minimal_roundtrip_through_preset_module():
    settings = make_insecure_setup(kzg_minimal.PRESET)
    blob = kzg_minimal.Blob(
        b"".join(i.to_bytes(32, "big") for i in (7, 11, 13, 17))
    )
    c = kzg_minimal.Kzg.blob_to_kzg_commitment(blob, settings)
    z = Bytes32((5).to_bytes(32, "big"))
    proof, y = kzg_minimal.Kzg.compute_kzg_proof(blob, z, settings)
    assert kzg_minimal.Kzg.verify_kzg_proof(c, z, y, proof, settings) is True
    bad_y = Bytes32((int.from_bytes(bytes(y), "big") ^ 1).to_bytes(32, "big"))
    assert kzg_minimal.Kzg.verify_kzg_proof(c, z, bad_y, proof, settings) is False
    bp = kzg_minimal.Kzg.compute_blob_kzg_proof(blob, c, settings)
    assert kzg_minimal.Kzg.verify_blob_kzg_proof(blob, c, bp, settings) is True
    assert (
        kzg_minimal.Kzg.verify_blob_kzg_proof_batch([blob], [c], [bp], settings)
        is True
    )


def test_mainnet_loader_defaults_to_mainnet(tmp_path):
    # A minimal-sized setup must be rejected by the mainnet-bound loader.
    from kzg_rust_tpu.errors import InvalidTrustedSetup
    from kzg_rust_tpu.utils.testing import write_insecure_setup_file

    path = tmp_path / "minimal_setup.txt"
    write_insecure_setup_file(path, kzg_minimal.PRESET)
    with pytest.raises(InvalidTrustedSetup):
        kzg_mainnet.Kzg.load_trusted_setup_file(str(path))
    loaded = kzg_minimal.Kzg.load_trusted_setup_file(str(path))
    assert loaded.preset.field_elements_per_blob == 4
