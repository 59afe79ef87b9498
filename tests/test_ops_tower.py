"""Unit tests: the device extension-tower layers (Fp2, Fp6) against the
golden oracle.  fp12-level ops (mul/sqr/inv/frobenius/cyclotomic) and the
full pairing are covered by tests/test_ops_pairing.py; this file pins the
intermediate layers the pairing is built from (reference equivalent: the
blst fp2/fp6 tower behind blst_miller_loop, SURVEY.md section 2.3).
"""

from __future__ import annotations

import random

import numpy as np

from kzg_rust_tpu.golden import field as gf
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import tower as T
from kzg_rust_tpu.ops.fields import FP

rng = random.Random(0x70735)


def rand_fp2():
    return (rng.randrange(gf.P), rng.randrange(gf.P))


def rand_fp6():
    return (rand_fp2(), rand_fp2(), rand_fp2())


def fp2_to_golden(a):
    return (
        L.limbs_to_int(np.asarray(L.from_mont(FP, a[0]))),
        L.limbs_to_int(np.asarray(L.from_mont(FP, a[1]))),
    )


def fp6_from_golden(a, shape=()):
    return tuple(T.fp2_from_golden(c, shape) for c in a)


def fp6_to_golden(a):
    return tuple(fp2_to_golden(c) for c in a)


def test_fp2_ops_match_golden():
    a, b = rand_fp2(), rand_fp2()
    da, db = T.fp2_from_golden(a), T.fp2_from_golden(b)
    assert fp2_to_golden(T.fp2_add(da, db)) == gf.fp2_add(a, b)
    assert fp2_to_golden(T.fp2_sub(da, db)) == gf.fp2_sub(a, b)
    assert fp2_to_golden(T.fp2_mul(da, db)) == gf.fp2_mul(a, b)
    assert fp2_to_golden(T.fp2_sqr(da)) == gf.fp2_sqr(a)
    assert fp2_to_golden(T.fp2_conj(da)) == gf.fp2_conj(a)
    assert fp2_to_golden(T.fp2_inv(da)) == gf.fp2_inv(a)
    k = rng.randrange(gf.P)
    k_m = np.asarray(L.int_to_limbs(FP.nlimbs, (k * FP.mont_r) % gf.P))
    assert fp2_to_golden(T.fp2_mul_fp(da, k_m)) == gf.fp2_mul_fp(a, k)
    # xi = 1 + u multiplication (the Fp6 non-residue)
    assert fp2_to_golden(T.fp2_mul_by_xi(da)) == gf.fp2_mul(a, (1, 1))
    # inv(0) convention and zero detection
    zero = T.fp2_zeros(())
    assert bool(np.asarray(T.fp2_is_zero(zero)))
    assert not bool(np.asarray(T.fp2_is_zero(da)))


def test_fp6_ops_match_golden():
    a, b = rand_fp6(), rand_fp6()
    da, db = fp6_from_golden(a), fp6_from_golden(b)
    assert fp6_to_golden(T.fp6_add(da, db)) == gf.fp6_add(a, b)
    assert fp6_to_golden(T.fp6_sub(da, db)) == gf.fp6_sub(a, b)
    assert fp6_to_golden(T.fp6_mul(da, db)) == gf.fp6_mul(a, b)
    assert fp6_to_golden(T.fp6_sqr(da)) == gf.fp6_sqr(a)
    assert fp6_to_golden(T.fp6_mul_by_v(da)) == gf.fp6_mul_by_v(a)
    assert fp6_to_golden(T.fp6_inv(da)) == gf.fp6_inv(a)
    k = rand_fp2()
    assert fp6_to_golden(T.fp6_mul_fp2(da, T.fp2_from_golden(k))) == gf.fp6_mul_fp2(
        a, k
    )


def test_fp2_batched_broadcasts():
    """Tower ops must vectorize over leading axes (the pairing runs a [2]
    batch of Miller loops in one program)."""
    vals = [rand_fp2() for _ in range(4)]
    c0 = np.stack([np.asarray(L.int_to_limbs(FP.nlimbs, (v[0] * FP.mont_r) % gf.P)) for v in vals])
    c1 = np.stack([np.asarray(L.int_to_limbs(FP.nlimbs, (v[1] * FP.mont_r) % gf.P)) for v in vals])
    import jax.numpy as jnp

    da = (jnp.asarray(c0), jnp.asarray(c1))
    out = T.fp2_sqr(da)
    for i, v in enumerate(vals):
        got = (
            L.limbs_to_int(np.asarray(L.from_mont(FP, out[0][i]))),
            L.limbs_to_int(np.asarray(L.from_mont(FP, out[1][i]))),
        )
        assert got == gf.fp2_sqr(v)
