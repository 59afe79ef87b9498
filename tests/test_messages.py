"""Single-source error-string contract (VERDICT round-3 item 8).

``kzg_rust_tpu.messages`` is the one place validation strings and the
native rc-code mapping live; these tests pin every consumer to it so a
future message change is one edit, not 3-4 coordinated ones.
"""

from __future__ import annotations

import pytest

from kzg_rust_tpu import messages as M
from kzg_rust_tpu.errors import BadArgs


def test_native_tables_are_the_shared_objects():
    from kzg_rust_tpu.native import ProverCtx, VerifyCtx

    assert VerifyCtx._ERRORS is M.VERIFY_RC_ERRORS
    assert ProverCtx._ERRORS is M.PROVER_RC_ERRORS


def test_rc_tables_agree_on_shared_codes():
    for code, msg in M.PROVER_RC_ERRORS.items():
        assert M.VERIFY_RC_ERRORS[code] == msg


def test_g2_uncompress_strings_single_sourced():
    """golden and native both raise the messages.py G2 strings (round-4
    review: these were hand-duplicated when native G2 landed)."""
    import inspect

    from kzg_rust_tpu import native
    from kzg_rust_tpu.golden import curve as gcurve

    src_native = inspect.getsource(native.g2_uncompress)
    assert "G2_UNCOMPRESS_RC_ERRORS" in src_native
    assert "MSG_G2_EXPECT_96" in src_native
    src_golden = inspect.getsource(gcurve.g2_uncompress)
    for name in (
        "MSG_G2_EXPECT_96",
        "MSG_G2_UNCOMPRESSED_BIT",
        "MSG_G2_BAD_INFINITY",
        "MSG_G2_X_RANGE",
        "MSG_G2_NOT_ON_CURVE",
    ):
        assert name in src_golden, name


def test_python_paths_raise_the_shared_strings(settings):
    from kzg_rust_tpu import protocol
    from kzg_rust_tpu.utils import bls_serde

    with pytest.raises(BadArgs, match="^" + M.MSG_INVALID_BYTES32 + "$"):
        bls_serde.bytes_to_bls_field(b"\xff" * 32)

    with pytest.raises(BadArgs, match="^" + M.MSG_BLOB_LENGTH + "$"):
        protocol.blob_to_polynomial(settings, b"\x00" * 31)


def test_golden_batch_inv_uses_shared_string():
    from kzg_rust_tpu.golden import field as gf

    with pytest.raises(BadArgs, match="^" + M.MSG_BATCH_INV_ZERO + "$"):
        gf.fr_batch_inv([1, 0, 2])
