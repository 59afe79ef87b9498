"""Unit tests: device GLV fixed-base MSM and its recodings vs golden.

Small point sets keep XLA compile time bounded; the mainnet-width path is
exercised by the conformance suite (tests/test_conformance.py).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.ops import glv
from kzg_rust_tpu.ops import msm as M

rng = random.Random(0x5EED)

EDGE_SCALARS = [0, 1, R - 1, R // 2, (R + 1) // 2, glv.Z2, R - glv.Z2, glv.LAM]


@pytest.fixture(scope="module")
def ctx_points():
    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(16)]
    ctx = M.MsmContext.build_from_points(pts, fold=64)
    return ctx, pts


def test_recode_signed_digits():
    # Base-16 recode (generator-table machinery, verify_kernels.gen_mult).
    scalars = [rng.randrange(R) for _ in range(8)] + [0, 1, R - 1]
    digits = M.recode_signed_digits(scalars, len(scalars))
    assert digits.shape == (64, len(scalars))
    for k, s in enumerate(scalars):
        acc = sum(int(digits[j, k]) << (4 * j) for j in range(64))
        assert acc == s
        assert all(-8 <= int(digits[j, k]) <= 8 for j in range(64))


def test_glv_decompose_and_base32_recode():
    scalars = [rng.randrange(R) for _ in range(16)] + EDGE_SCALARS
    k1s, k2s = glv.decompose_batch(scalars)
    for k, k1, k2 in zip(scalars, k1s, k2s):
        assert (k1 + k2 * glv.LAM) % R == k % R
        assert abs(k1) < 2**128 and abs(k2) < 2**128
    d1 = glv.recode_base32_signed(k1s)
    d2 = glv.recode_base32_signed(k2s)
    assert d1.shape == (M.GLV_NUM_WINDOWS, len(scalars))
    for i in range(len(scalars)):
        v1 = sum(int(d1[j, i]) * 32**j for j in range(M.GLV_NUM_WINDOWS))
        v2 = sum(int(d2[j, i]) * 32**j for j in range(M.GLV_NUM_WINDOWS))
        assert v1 == k1s[i] and v2 == k2s[i]
        assert all(abs(int(d1[j, i])) <= 16 for j in range(M.GLV_NUM_WINDOWS))


def test_glv_digits_from_limbs_device():
    # The on-device decomposition uses a floor-based Babai rounding; the
    # split may differ from the host's but must recombine to k mod r with
    # both halves under 2^128 (bound documented in ops/glv.py).
    import jax.numpy as jnp

    from kzg_rust_tpu.ops import limbs as L
    from kzg_rust_tpu.ops.fields import FR

    scalars = [rng.randrange(R) for _ in range(16)] + EDGE_SCALARS
    limbs = jnp.asarray(L.ints_to_limbs(FR.nlimbs, scalars))
    d1, d2 = M.glv_digits_from_limbs(limbs)
    d1, d2 = np.asarray(d1), np.asarray(d2)
    for i, k in enumerate(scalars):
        v1 = sum(int(d1[j, i]) * 32**j for j in range(M.GLV_NUM_WINDOWS))
        v2 = sum(int(d2[j, i]) * 32**j for j in range(M.GLV_NUM_WINDOWS))
        assert (v1 + v2 * glv.LAM) % R == k % R, (i, k)
        assert abs(v1) < 2**128 and abs(v2) < 2**128


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
