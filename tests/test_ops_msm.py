"""Unit tests: device fixed-base MSM and Fr protocol kernels vs golden.

Small point sets keep XLA compile time bounded; the mainnet-width path is
exercised by the conformance suite (tests/test_conformance.py).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import msm as M

rng = random.Random(0x5EED)


@pytest.fixture(scope="module")
def ctx_points():
    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(16)]
    ctx = M.MsmContext.build_from_points(pts, fold=64)
    return ctx, pts


def test_recode_signed_digits():
    scalars = [rng.randrange(R) for _ in range(8)] + [0, 1, R - 1]
    digits = M.recode_signed_digits(scalars, len(scalars))
    assert digits.shape == (64, len(scalars))
    # Digits reconstruct the scalar exactly.
    for k, s in enumerate(scalars):
        acc = sum(int(digits[j, k]) << (4 * j) for j in range(64))
        assert acc == s
        assert all(-8 <= int(digits[j, k]) <= 8 for j in range(64))


def test_msm_matches_naive(ctx_points):
    ctx, pts = ctx_points
    scalars = [rng.randrange(R) for _ in range(len(pts))]
    got = M.msm_fixed_base(ctx, scalars)
    assert got == gc.g1_lincomb_naive(pts, scalars)


def test_msm_edge_scalars(ctx_points):
    ctx, pts = ctx_points
    # zeros, ones, r-1 and a sparse pattern
    scalars = [0] * len(pts)
    assert M.msm_fixed_base(ctx, scalars) is None
    scalars[3] = 1
    assert M.msm_fixed_base(ctx, scalars) == pts[3]
    scalars = [R - 1] * len(pts)
    assert M.msm_fixed_base(ctx, scalars) == gc.g1_lincomb_naive(pts, scalars)


def test_msm_with_infinity_base():
    # Same point count / fold as ctx_points so the compiled kernels are
    # shared (every distinct shape costs a full XLA compile set).
    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(15)] + [None]
    ctx = M.MsmContext.build_from_points(pts, fold=64)
    scalars = [rng.randrange(R) for _ in range(16)]
    assert M.msm_fixed_base(ctx, scalars) == gc.g1_lincomb_naive(pts, scalars)
