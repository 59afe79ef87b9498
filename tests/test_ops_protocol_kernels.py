"""Unit tests: device Fr protocol kernels vs the golden backend."""

from __future__ import annotations

import random

import pytest

from kzg_rust_tpu import Kzg
from kzg_rust_tpu.backends.golden_backend import GoldenBackend
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import protocol_kernels as pk
from kzg_rust_tpu.presets import MINIMAL
from kzg_rust_tpu.settings import KzgSettings
from kzg_rust_tpu.utils.domain import compute_roots_of_unity

rng = random.Random(0xFEED)


@pytest.fixture(scope="module")
def small_settings():
    """A 4096-free settings stub: only roots of unity matter for these
    kernels, so fabricate a width-256 domain."""
    scale = 8
    roots = compute_roots_of_unity(scale)
    from kzg_rust_tpu.presets import Preset

    preset = Preset(name="test256", field_elements_per_blob=1 << scale)
    return KzgSettings(
        preset=preset,
        max_width=1 << scale,
        roots_of_unity=roots,
        g1_values=[],
        g2_values=[],
    )


def test_barycentric_eval_matches_golden(small_settings):
    golden = GoldenBackend()
    ctx = pk.FrContext.build(small_settings)
    n = small_settings.preset.field_elements_per_blob
    evals = [rng.randrange(R) for _ in range(n)]
    for _ in range(3):
        x = rng.randrange(R)
        assert pk.barycentric_eval(ctx, evals, x) == golden.barycentric_eval(
            small_settings, evals, x
        )


def test_quotient_out_of_domain_matches_golden(small_settings):
    golden = GoldenBackend()
    ctx = pk.FrContext.build(small_settings)
    n = small_settings.preset.field_elements_per_blob
    evals = [rng.randrange(R) for _ in range(n)]
    z, y = rng.randrange(R), rng.randrange(R)
    assert pk.quotient_out_of_domain(ctx, evals, z, y) == golden.quotient_out_of_domain(
        small_settings, evals, z, y
    )


def test_quotient_in_domain_matches_golden(small_settings):
    golden = GoldenBackend()
    ctx = pk.FrContext.build(small_settings)
    n = small_settings.preset.field_elements_per_blob
    evals = [rng.randrange(R) for _ in range(n)]
    for m in (0, 1, n - 1):
        z = small_settings.roots_of_unity[m]
        y = evals[m]
        assert pk.quotient_in_domain(ctx, evals, z, y, m) == golden.quotient_in_domain(
            small_settings, evals, z, y, m
        )
