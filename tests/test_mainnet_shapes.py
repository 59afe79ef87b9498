"""CI gate for the mainnet-shape AOT lowering of every sharded program
(VERDICT round-3 item 6): the same check the driver's multichip dryrun
runs, kept in CI so a shard-spec or shape regression fails before a pod
would hit it.  Lowering only — no XLA backend compile, no execute."""

from __future__ import annotations

import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_mainnet_shapes_lower_on_8_device_mesh(capsys):
    import __graft_entry__ as entry

    entry.dryrun_mainnet_shapes(8)
    out = capsys.readouterr().out
    assert "DRYRUN_MAINNET_SHAPES_OK" in out
    assert "msm_2axis" in out
