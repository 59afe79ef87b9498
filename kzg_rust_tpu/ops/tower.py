"""Device extension-field tower: Fp2 -> Fp6 -> Fp12 on limb tensors.

The blst pairing surface (reference: utils.rs:189-214 via blst_miller_loop/
blst_final_exp; SURVEY.md section 2.3 "Pairing" row) rebuilt as JAX tensor
programs.  Elements are nested tuples of ``[..., NLIMBS_FP]`` uint32 arrays
(Montgomery form), mirroring the golden tower (golden/field.py:137-393):

    Fp2  = (c0, c1)            u^2 = -1
    Fp6  = (a0, a1, a2)        v^3 = xi = 1 + u
    Fp12 = (b0, b1)            w^2 = v

Every operation is branch-free and batchable over leading axes.  The golden
model is the oracle for each op (tests/test_ops_tower.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..golden import field as gf
from . import limbs as L
from .fields import FP


def _mul(a, b):
    return L.mont_mul(FP, a, b)


def _add(a, b):
    return L.add_mod(FP, a, b)


def _sub(a, b):
    return L.sub_mod(FP, a, b)


def _neg(a):
    return L.neg_mod(FP, a)


# ---------------------------------------------------------------------------
# Fp2
# ---------------------------------------------------------------------------


def fp2_zeros(shape=()):
    z = jnp.zeros(tuple(shape) + (FP.nlimbs,), jnp.uint32)
    return (z, z)


def fp2_one(shape=()):
    one = jnp.broadcast_to(jnp.asarray(FP.one_mont), tuple(shape) + (FP.nlimbs,))
    z = jnp.zeros_like(one)
    return (one, z)


def fp2_add(a, b):
    return (_add(a[0], b[0]), _add(a[1], b[1]))


def fp2_sub(a, b):
    return (_sub(a[0], b[0]), _sub(a[1], b[1]))


def fp2_neg(a):
    return (_neg(a[0]), _neg(a[1]))


def fp2_conj(a):
    return (a[0], _neg(a[1]))


def fp2_mul(a, b):
    # Karatsuba over u^2 = -1: 3 Fp multiplies.
    t0 = _mul(a[0], b[0])
    t1 = _mul(a[1], b[1])
    c1 = _sub(_sub(_mul(_add(a[0], a[1]), _add(b[0], b[1])), t0), t1)
    return (_sub(t0, t1), c1)


def fp2_sqr(a):
    # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u: 2 Fp multiplies.
    t = _mul(_add(a[0], a[1]), _sub(a[0], a[1]))
    return (t, _mul(_add(a[0], a[0]), a[1]))


def fp2_mul_fp(a, k):
    return (_mul(a[0], k), _mul(a[1], k))


def fp2_mul_by_xi(a):
    """Multiply by xi = 1 + u: (c0 - c1, c0 + c1)."""
    return (_sub(a[0], a[1]), _add(a[0], a[1]))


def fp2_double(a):
    return (_add(a[0], a[0]), _add(a[1], a[1]))


def fp2_inv(a):
    """(a0 - a1 u) / (a0^2 + a1^2); Fermat inversion of the norm.
    inv(0) == 0 (mont_inv semantics)."""
    norm = _add(_mul(a[0], a[0]), _mul(a[1], a[1]))
    ninv = L.mont_inv(FP, norm)
    return (_mul(a[0], ninv), _neg(_mul(a[1], ninv)))


def fp2_is_zero(a):
    return L.is_zero(a[0]) & L.is_zero(a[1])


def fp2_select(mask, a, b):
    return (L.select(mask, a[0], b[0]), L.select(mask, a[1], b[1]))


def fp2_const(c0: int, c1: int, shape=()):
    """Python ints -> Montgomery Fp2 constant tensor."""
    rr = FP.mont_r
    a = jnp.broadcast_to(
        jnp.asarray(L.int_to_limbs(FP.nlimbs, (c0 * rr) % FP.modulus)),
        tuple(shape) + (FP.nlimbs,),
    )
    b = jnp.broadcast_to(
        jnp.asarray(L.int_to_limbs(FP.nlimbs, (c1 * rr) % FP.modulus)),
        tuple(shape) + (FP.nlimbs,),
    )
    return (a, b)


# ---------------------------------------------------------------------------
# Fp6
# ---------------------------------------------------------------------------


def fp6_add(a, b):
    return tuple(fp2_add(x, y) for x, y in zip(a, b))


def fp6_sub(a, b):
    return tuple(fp2_sub(x, y) for x, y in zip(a, b))


def fp6_neg(a):
    return tuple(fp2_neg(x) for x in a)


def fp6_mul(a, b):
    # Karatsuba-Toom over v^3 = xi (mirrors golden/field.py:275-287).
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fp2_mul(a0, b0)
    t1 = fp2_mul(a1, b1)
    t2 = fp2_mul(a2, b2)
    c0 = fp2_add(
        t0,
        fp2_mul_by_xi(
            fp2_sub(fp2_mul(fp2_add(a1, a2), fp2_add(b1, b2)), fp2_add(t1, t2))
        ),
    )
    c1 = fp2_add(
        fp2_sub(fp2_mul(fp2_add(a0, a1), fp2_add(b0, b1)), fp2_add(t0, t1)),
        fp2_mul_by_xi(t2),
    )
    c2 = fp2_add(
        fp2_sub(fp2_mul(fp2_add(a0, a2), fp2_add(b0, b2)), fp2_add(t0, t2)), t1
    )
    return (c0, c1, c2)


def fp6_sqr(a):
    return fp6_mul(a, a)


def fp6_mul_by_v(a):
    return (fp2_mul_by_xi(a[2]), a[0], a[1])


def fp6_mul_fp2(a, k):
    return tuple(fp2_mul(x, k) for x in a)


def fp6_inv(a):
    # mirrors golden/field.py:303-313
    a0, a1, a2 = a
    t0 = fp2_sub(fp2_sqr(a0), fp2_mul_by_xi(fp2_mul(a1, a2)))
    t1 = fp2_sub(fp2_mul_by_xi(fp2_sqr(a2)), fp2_mul(a0, a1))
    t2 = fp2_sub(fp2_sqr(a1), fp2_mul(a0, a2))
    factor = fp2_add(
        fp2_mul(a0, t0),
        fp2_mul_by_xi(fp2_add(fp2_mul(a2, t1), fp2_mul(a1, t2))),
    )
    finv = fp2_inv(factor)
    return (fp2_mul(t0, finv), fp2_mul(t1, finv), fp2_mul(t2, finv))


def fp6_zeros(shape=()):
    return (fp2_zeros(shape), fp2_zeros(shape), fp2_zeros(shape))


def fp6_one(shape=()):
    return (fp2_one(shape), fp2_zeros(shape), fp2_zeros(shape))


# ---------------------------------------------------------------------------
# Fp12
# ---------------------------------------------------------------------------


def fp12_one(shape=()):
    return (fp6_one(shape), fp6_zeros(shape))


def fp12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = fp6_mul(a0, b0)
    t1 = fp6_mul(a1, b1)
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(b0, b1)), t0), t1)
    return (c0, c1)


def fp12_sqr(a):
    # complex squaring (2 Fp6 multiplies; mirrors golden/field.py fp12_sqr)
    a0, a1 = a
    t = fp6_mul(a0, a1)
    c0 = fp6_sub(
        fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(a0, fp6_mul_by_v(a1))), t),
        fp6_mul_by_v(t),
    )
    return (c0, fp6_add(t, t))


def fp12_conj(a):
    return (a[0], fp6_neg(a[1]))


def fp12_inv(a):
    a0, a1 = a
    norm = fp6_sub(fp6_sqr(a0), fp6_mul_by_v(fp6_sqr(a1)))
    ninv = fp6_inv(norm)
    return (fp6_mul(a0, ninv), fp6_neg(fp6_mul(a1, ninv)))


def fp12_cyclo_sqr(a):
    """Granger-Scott squaring in the cyclotomic subgroup
    (mirrors golden/field.py fp12_cyclo_sqr)."""
    (g0, g1, g2), (g3, g4, g5) = a

    t0 = fp2_sqr(g4)
    t1 = fp2_sqr(g0)
    t6 = fp2_sub(fp2_sub(fp2_sqr(fp2_add(g4, g0)), t0), t1)
    t2 = fp2_sqr(g2)
    t3 = fp2_sqr(g3)
    t7 = fp2_sub(fp2_sub(fp2_sqr(fp2_add(g2, g3)), t2), t3)
    t4 = fp2_sqr(g5)
    t5 = fp2_sqr(g1)
    t8 = fp2_mul_by_xi(fp2_sub(fp2_sub(fp2_sqr(fp2_add(g5, g1)), t4), t5))

    t0 = fp2_add(fp2_mul_by_xi(t0), t1)
    t2 = fp2_add(fp2_mul_by_xi(t2), t3)
    t4 = fp2_add(fp2_mul_by_xi(t4), t5)

    z0 = fp2_add(fp2_double(fp2_sub(t0, g0)), t0)
    z1 = fp2_add(fp2_double(fp2_sub(t2, g1)), t2)
    z2 = fp2_add(fp2_double(fp2_sub(t4, g2)), t4)
    z3 = fp2_add(fp2_double(fp2_add(t8, g3)), t8)
    z4 = fp2_add(fp2_double(fp2_add(t6, g4)), t6)
    z5 = fp2_add(fp2_double(fp2_add(t7, g5)), t7)
    return ((z0, z1, z2), (z3, z4, z5))


# Frobenius coefficients gamma^k = xi^(k (p-1)/6) as Montgomery constants
# (mirrors golden/field.py:370-387).
_GAMMA_POWERS_INT = gf._GAMMA_POWERS


def fp12_frobenius(a):
    (c0, c2, c4), (c1, c3, c5) = a
    g = [fp2_const(*_GAMMA_POWERS_INT[k]) for k in range(6)]
    c0 = fp2_conj(c0)
    c1 = fp2_mul(fp2_conj(c1), g[1])
    c2 = fp2_mul(fp2_conj(c2), g[2])
    c3 = fp2_mul(fp2_conj(c3), g[3])
    c4 = fp2_mul(fp2_conj(c4), g[4])
    c5 = fp2_mul(fp2_conj(c5), g[5])
    return ((c0, c2, c4), (c1, c3, c5))


def fp12_frobenius_n(a, n: int):
    for _ in range(n):
        a = fp12_frobenius(a)
    return a


def fp12_is_one(a):
    """bool tensor: a == 1 (canonical Montgomery comparison)."""
    one = fp12_one(a[0][0][0].shape[:-1])
    eqs = []
    for ha, ho in zip(a, one):
        for fa, fo in zip(ha, ho):
            for ca, co in zip(fa, fo):
                eqs.append(L.eq(ca, co))
    out = eqs[0]
    for e in eqs[1:]:
        out = out & e
    return out


# ---------------------------------------------------------------------------
# Host codecs (golden tower values <-> device tensors), for tests
# ---------------------------------------------------------------------------


def fp2_from_golden(a, shape=()):
    return fp2_const(a[0], a[1], shape)


def fp12_from_golden(x, shape=()):
    return tuple(
        tuple(fp2_from_golden(c, shape) for c in h) for h in x
    )


def fp12_to_golden(x):
    """Device Fp12 (unbatched) -> golden nested-int tuples."""
    out = []
    for h in x:
        row = []
        for c in h:
            c0 = L.limbs_to_int(np.asarray(L.from_mont(FP, c[0])))
            c1 = L.limbs_to_int(np.asarray(L.from_mont(FP, c[1])))
            row.append((c0, c1))
        out.append(tuple(row))
    return (tuple(out[0]), tuple(out[1]))
