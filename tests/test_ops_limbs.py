"""Unit tests: device limb arithmetic vs the pure-Python golden model.

Per SURVEY.md section 4 ("add what the reference lacks"): per-primitive
tests of Fp/Fr ops against the bigint oracle.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops.fields import FP, FR

rng = random.Random(0xB15)


def rand_elems(spec, k):
    return [rng.randrange(spec.modulus) for _ in range(k)]


@pytest.mark.parametrize("spec", [FP, FR], ids=["fp", "fr"])
def test_codec_roundtrip(spec):
    vals = rand_elems(spec, 16) + [0, 1, spec.modulus - 1]
    arr = L.ints_to_limbs(spec.nlimbs, vals)
    assert arr.dtype == np.uint32
    assert L.limbs_to_ints(arr) == vals


@pytest.mark.parametrize("spec", [FP, FR], ids=["fp", "fr"])
def test_add_sub_neg(spec):
    a_v = rand_elems(spec, 32) + [0, spec.modulus - 1]
    b_v = rand_elems(spec, 32) + [spec.modulus - 1, spec.modulus - 1]
    a = L.ints_to_limbs(spec.nlimbs, a_v)
    b = L.ints_to_limbs(spec.nlimbs, b_v)
    assert L.limbs_to_ints(L.add_mod(spec, a, b)) == [
        (x + y) % spec.modulus for x, y in zip(a_v, b_v)
    ]
    assert L.limbs_to_ints(L.sub_mod(spec, a, b)) == [
        (x - y) % spec.modulus for x, y in zip(a_v, b_v)
    ]
    assert L.limbs_to_ints(L.neg_mod(spec, a)) == [(-x) % spec.modulus for x in a_v]


@pytest.mark.parametrize("spec", [FP, FR], ids=["fp", "fr"])
def test_mont_mul(spec):
    a_v = rand_elems(spec, 64) + [0, 1, spec.modulus - 1]
    b_v = rand_elems(spec, 64) + [spec.modulus - 1, 1, spec.modulus - 1]
    a = L.to_mont(spec, L.ints_to_limbs(spec.nlimbs, a_v))
    b = L.to_mont(spec, L.ints_to_limbs(spec.nlimbs, b_v))
    out = L.from_mont(spec, L.mont_mul(spec, a, b))
    assert L.limbs_to_ints(out) == [(x * y) % spec.modulus for x, y in zip(a_v, b_v)]


@pytest.mark.parametrize("spec", [FP, FR], ids=["fp", "fr"])
def test_mont_roundtrip_and_pow(spec):
    vals = rand_elems(spec, 8) + [0, 1]
    x = L.ints_to_limbs(spec.nlimbs, vals)
    xm = L.to_mont(spec, x)
    assert L.limbs_to_ints(L.from_mont(spec, xm)) == vals
    e = 0xDEADBEEFCAFE
    out = L.from_mont(spec, L.mont_pow_const(spec, xm, e))
    assert L.limbs_to_ints(out) == [pow(v, e, spec.modulus) for v in vals]


@pytest.mark.parametrize("spec", [FP, FR], ids=["fp", "fr"])
def test_inv(spec):
    vals = rand_elems(spec, 8) + [1, spec.modulus - 1]
    xm = L.to_mont(spec, L.ints_to_limbs(spec.nlimbs, vals))
    out = L.from_mont(spec, L.mont_inv(spec, xm))
    assert L.limbs_to_ints(out) == [pow(v, -1, spec.modulus) for v in vals]


def test_batch_inv():
    vals = rand_elems(FR, 64)
    xm = L.to_mont(FR, L.ints_to_limbs(FR.nlimbs, vals))
    out = L.from_mont(FR, L.batch_mont_inv(FR, xm, axis=0))
    assert L.limbs_to_ints(out) == [pow(v, -1, FR.modulus) for v in vals]


def test_predicates():
    vals = [0, 1, 5, FR.modulus - 1]
    x = L.ints_to_limbs(FR.nlimbs, vals)
    assert list(np.asarray(L.is_zero(x))) == [True, False, False, False]
    assert list(np.asarray(L.eq(x, x))) == [True] * 4
