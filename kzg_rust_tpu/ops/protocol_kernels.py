"""Device kernels for the Fr-vector protocol math.

The 4096-wide polynomial pipeline the reference runs as scalar loops
(reference: src/kzg.rs:346-389 barycentric evaluation; :468-523 quotient
construction) re-expressed as fixed-shape, fully vectorized JAX programs over
the Fr limb representation.  The in-domain special case (reference:
kzg.rs:471-523) is a masked select on a device index, not a branch, so one
compiled program serves every call.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..golden.field import R
from . import limbs as L
from .fields import FR


def sum_mod(spec, x, axis: int = 0):
    """Sum Montgomery-form field elements along ``axis``, Montgomery out.

    One raw uint32 column accumulation + one Montgomery reduction + one
    re-encode multiply (``to_mont``) — ~4x fewer wide ops than the previous
    log-depth tree of modular adds, exact for up to 2^19 terms
    (:func:`limbs.sum_mont_redc`).  Tiny axes keep the plain add."""
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n == 1:
        return x[0]
    if n == 2:
        return L.add_mod(spec, x[0], x[1])
    return L.to_mont(spec, L.sum_mont_redc(spec, x, axis=0))


class FrContext:
    """Per-settings device state for the polynomial kernels: the bit-reversed
    roots of unity as Montgomery limb tensors, plus width constants.

    ``roots_m2`` carries ``w * R^2``: multiplying CANONICAL evaluations by it
    through two Montgomery products lands directly on ``(e * v) * R``, which
    saves the full-width ``to_mont(evals)`` in the barycentric kernels (one
    of their three measured cost-floor multiplies)."""

    def __init__(self, n: int, roots_m, roots_m2, inv_n_m):
        self.n = n
        self.roots_m = roots_m  # [n, NLIMBS_FR] Montgomery form (w R)
        self.roots_m2 = roots_m2  # [n, NLIMBS_FR] w R^2
        self.inv_n_m = inv_n_m  # [NLIMBS_FR] mont(1/n)

    @classmethod
    def build(cls, settings) -> "FrContext":
        n = settings.preset.field_elements_per_blob
        rr = FR.mont_r
        roots_m = L.ints_to_limbs(
            FR.nlimbs, [(w * rr) % R for w in settings.roots_of_unity]
        )
        roots_m2 = L.ints_to_limbs(
            FR.nlimbs, [(w * rr * rr) % R for w in settings.roots_of_unity]
        )
        inv_n_m = L.int_to_limbs(FR.nlimbs, (pow(n, -1, R) * rr) % R)
        return cls(
            n, jnp.asarray(roots_m), jnp.asarray(roots_m2), jnp.asarray(inv_n_m)
        )


def _evals_to_device(evals) -> jnp.ndarray:
    return jnp.asarray(L.ints_to_limbs(FR.nlimbs, evals))


def _fr_to_device(x: int) -> jnp.ndarray:
    return jnp.asarray(L.int_to_limbs(FR.nlimbs, x))


def _fr_from_device(x) -> int:
    return L.limbs_to_int(np.asarray(x))


@partial(jax.jit, static_argnums=0)
def _bary_kernel(n: int, roots_m, roots_m2, inv_n_m, evals, x):
    """p(x) = ((x^n - 1)/n) * sum_i e_i * w_i / (x - w_i) on device
    (reference: kzg.rs:346-389).  The caller guarantees x is out of domain,
    so every denominator is nonzero.  evals stay canonical — the w R^2
    constant lands the term products in Montgomery form without a
    ``to_mont`` over the [n] tensor (see FrContext)."""
    mul = lambda u, v: L.mont_mul(FR, u, v)
    x_m = L.to_mont(FR, x)
    d = L.sub_mod(FR, jnp.broadcast_to(x_m, roots_m.shape), roots_m)
    inv = L.batch_mont_inv(FR, d, axis=0)
    terms = mul(mul(inv, roots_m2), evals)
    s = sum_mod(FR, terms, axis=0)
    s = mul(s, inv_n_m)
    xn = L.mont_pow_const(FR, x_m, n)
    one_m = jnp.asarray(FR.one_mont)
    s = mul(s, L.sub_mod(FR, xn, one_m))
    return L.from_mont(FR, s)


def barycentric_eval(ctx: FrContext, evals, x: int) -> int:
    out = _bary_kernel(
        ctx.n,
        ctx.roots_m,
        ctx.roots_m2,
        ctx.inv_n_m,
        _evals_to_device(evals),
        _fr_to_device(x),
    )
    return _fr_from_device(out)


@jax.jit
def _quotient_out_kernel(roots_m, evals, z, y):
    """q_i = (e_i - y) / (w_i - z) (reference: kzg.rs:468-491)."""
    mul = lambda u, v: L.mont_mul(FR, u, v)
    e_m = L.to_mont(FR, evals)
    z_m = L.to_mont(FR, z)
    y_m = L.to_mont(FR, y)
    d = L.sub_mod(FR, roots_m, jnp.broadcast_to(z_m, roots_m.shape))
    inv = L.batch_mont_inv(FR, d, axis=0)
    q = mul(L.sub_mod(FR, e_m, jnp.broadcast_to(y_m, e_m.shape)), inv)
    return L.from_mont(FR, q)


def quotient_out_of_domain(ctx: FrContext, evals, z: int, y: int):
    out = _quotient_out_kernel(
        ctx.roots_m, _evals_to_device(evals), _fr_to_device(z), _fr_to_device(y)
    )
    return L.limbs_to_ints(np.asarray(out))


@jax.jit
def _quotient_in_kernel(roots_m, evals, z, y, m):
    """z == w_m: q_i = (e_i - y)/(w_i - z) for i != m, and
    q_m = sum_{i != m} (e_i - y) * w_i / (z * (z - w_i))
    (reference: kzg.rs:471-523).  ``m`` is a device index; the special row is
    a masked select so one compiled program covers every evaluation point."""
    mul = lambda u, v: L.mont_mul(FR, u, v)
    n = roots_m.shape[0]
    e_m = L.to_mont(FR, evals)
    z_m = L.to_mont(FR, z)
    y_m = L.to_mont(FR, y)
    one_m = jnp.asarray(FR.one_mont)
    is_m = jnp.arange(n) == m  # [n]

    e_minus_y = L.sub_mod(FR, e_m, jnp.broadcast_to(y_m, e_m.shape))

    den1 = L.sub_mod(FR, roots_m, jnp.broadcast_to(z_m, roots_m.shape))
    den1 = L.select(is_m, jnp.broadcast_to(one_m, den1.shape), den1)
    inv1 = L.batch_mont_inv(FR, den1, axis=0)
    q = mul(e_minus_y, inv1)

    zmw = L.sub_mod(FR, jnp.broadcast_to(z_m, roots_m.shape), roots_m)
    den2 = mul(zmw, jnp.broadcast_to(z_m, roots_m.shape))
    den2 = L.select(is_m, jnp.broadcast_to(one_m, den2.shape), den2)
    inv2 = L.batch_mont_inv(FR, den2, axis=0)
    terms = mul(mul(e_minus_y, roots_m), inv2)
    terms = L.select(is_m, jnp.zeros_like(terms), terms)
    qm = sum_mod(FR, terms, axis=0)

    q = L.select(is_m, jnp.broadcast_to(qm, q.shape), q)
    return L.from_mont(FR, q)


def quotient_in_domain(ctx: FrContext, evals, z: int, y: int, m: int):
    out = _quotient_in_kernel(
        ctx.roots_m,
        _evals_to_device(evals),
        _fr_to_device(z),
        _fr_to_device(y),
        jnp.asarray(m, dtype=jnp.int32),
    )
    return L.limbs_to_ints(np.asarray(out))
