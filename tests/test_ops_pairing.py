"""Unit tests: device extension tower + pairing vs the golden oracle."""

from __future__ import annotations

import random

import numpy as np
import pytest

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden import field as gf
from kzg_rust_tpu.golden import pairing as gp
from kzg_rust_tpu.ops import pairing as dp
from kzg_rust_tpu.ops import tower as T2

rng = random.Random(0xE11)


def rand_fp2():
    return (rng.randrange(gf.P), rng.randrange(gf.P))


def rand_fp12():
    return (
        (rand_fp2(), rand_fp2(), rand_fp2()),
        (rand_fp2(), rand_fp2(), rand_fp2()),
    )


def test_fp12_ops_match_golden():
    a, b = rand_fp12(), rand_fp12()
    da, db = T2.fp12_from_golden(a), T2.fp12_from_golden(b)
    assert T2.fp12_to_golden(T2.fp12_mul(da, db)) == gf.fp12_mul(a, b)
    assert T2.fp12_to_golden(T2.fp12_sqr(da)) == gf.fp12_sqr(a)
    assert T2.fp12_to_golden(T2.fp12_inv(da)) == gf.fp12_inv(a)
    assert T2.fp12_to_golden(T2.fp12_frobenius(da)) == gf.fp12_frobenius(a)
    # cyclotomic squaring on a unit-norm element
    t = gf.fp12_mul(gf.fp12_conj(a), gf.fp12_inv(a))
    t = gf.fp12_mul(gf.fp12_frobenius_n(t, 2), t)
    dt = T2.fp12_from_golden(t)
    assert T2.fp12_to_golden(T2.fp12_cyclo_sqr(dt)) == gf.fp12_cyclo_sqr(t)


_cpu_backend = None


def _on_cpu() -> bool:
    global _cpu_backend
    if _cpu_backend is None:
        import jax

        _cpu_backend = jax.default_backend() == "cpu"
    return _cpu_backend


@pytest.mark.slow_compile
def test_device_pairing_matches_golden():
    if _on_cpu():
        pytest.skip("CPU XLA takes >45min to compile the Miller scan; run on TPU")
    a = rng.randrange(1, gc.R)
    b = rng.randrange(1, gc.R)
    aP = gc.g1_mul(gc.G1_GENERATOR, a)
    bQ = gc.g2_mul(gc.G2_GENERATOR, b)
    abP = gc.g1_mul(gc.G1_GENERATOR, (a * b) % gc.R)
    # e(abP, Q) == e(aP, bQ)  (bilinearity)
    assert dp.pairings_verify_device(abP, gc.G2_GENERATOR, aP, bQ) is True
    # and a wrong pair fails
    assert dp.pairings_verify_device(aP, gc.G2_GENERATOR, aP, bQ) is False


@pytest.mark.slow_compile
def test_device_pairing_infinity_semantics():
    if _on_cpu():
        pytest.skip("CPU XLA takes >45min to compile the Miller scan; run on TPU")
    a = rng.randrange(1, gc.R)
    aP = gc.g1_mul(gc.G1_GENERATOR, a)
    # both Miller loops degenerate -> product is 1 -> verifies (matches
    # golden/blst behavior on infinity inputs)
    assert dp.pairings_verify_device(None, gc.G2_GENERATOR, None, gc.G2_GENERATOR) is True
    got = dp.pairings_verify_device(aP, gc.G2_GENERATOR, None, gc.G2_GENERATOR)
    want = gp.pairings_verify(aP, gc.G2_GENERATOR, None, gc.G2_GENERATOR)
    assert got is want
