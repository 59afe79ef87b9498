"""Trusted-setup loading: JSON parser, text loader, and the disk cache.

Covers the reference's two loader paths (reference: kzg.rs:906-979 text;
trusted_setup.rs JSON) and the cache layer this build adds on top.
"""

from __future__ import annotations

import pytest

from kzg_rust_tpu.errors import InvalidTrustedSetup
from kzg_rust_tpu.presets import MAINNET, MINIMAL
from kzg_rust_tpu.settings import (
    TrustedSetup,
    load_trusted_setup_file,
    load_trusted_setup_from_arrays,
)

from .conftest import TRUSTED_SETUP_JSON, TRUSTED_SETUP_TXT


@pytest.fixture(scope="module")
def text_settings():
    return load_trusted_setup_file(TRUSTED_SETUP_TXT)


def test_json_setup_matches_text_file(text_settings):
    """The JSON ceremony bundle and the text file carry the same setup
    (reference consumes only setup_G1_lagrange + setup_G2,
    trusted_setup.rs:22-26)."""
    ts = TrustedSetup.from_file(TRUSTED_SETUP_JSON)
    assert ts.g1_len() == MAINNET.field_elements_per_blob
    json_settings = load_trusted_setup_from_arrays(ts.g1_points(), ts.g2_points())
    assert json_settings.g1_values == text_settings.g1_values
    assert json_settings.g2_values == text_settings.g2_values
    assert json_settings.roots_of_unity == text_settings.roots_of_unity


def test_text_loader_rejects_wrong_preset():
    with pytest.raises(InvalidTrustedSetup):
        load_trusted_setup_file(TRUSTED_SETUP_TXT, MINIMAL)


def test_json_rejects_missing_keys():
    with pytest.raises(InvalidTrustedSetup):
        TrustedSetup.from_json('{"setup_G2": []}')


def test_cache_roundtrip(tmp_path, monkeypatch, text_settings):
    """Second load of the same ceremony comes from the npz cache and is
    identical to the freshly decompressed settings."""
    monkeypatch.setenv("KZG_TPU_CACHE_DIR", str(tmp_path))
    first = load_trusted_setup_file(TRUSTED_SETUP_TXT)
    assert len(list(tmp_path.glob("setup-*.npz"))) == 1
    second = load_trusted_setup_file(TRUSTED_SETUP_TXT)
    assert second.g1_values == first.g1_values == text_settings.g1_values
    assert second.g2_values == first.g2_values
    assert second.roots_of_unity == first.roots_of_unity
