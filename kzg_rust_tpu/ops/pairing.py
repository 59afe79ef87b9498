"""Device pairing: Miller loop + final exponentiation as one JAX program.

Replaces the last host-only blst capability (reference: pairings_verify at
utils.rs:189-214 -> blst_miller_loop / blst_final_exp / blst_fp12_mul /
blst_fp12_is_one; SURVEY.md section 2.3 "Pairing" row) with a branch-free
tensor implementation over :mod:`kzg_rust_tpu.ops.tower`.

Key departures from the golden (host) pairing, which is affine and inverts
per step (golden/pairing.py:62-81):

* The Miller variable T is HOMOGENEOUS PROJECTIVE over Fp2 with the
  exception-free RCB formulas (b' = 4 xi on the twist), and every line is
  scaled by its denominator (2YZ^2 for tangents, x2 Z - X for chords) -
  such Fp2 factors are annihilated by the final exponentiation, so no
  inversion appears anywhere in the loop.
* The two Miller loops of a pairing check run BATCHED (leading axis 2) in
  one 63-step ``lax.scan``; the conditional addition step is a masked
  select (both outcomes computed).
* The final exponentiation is the same cubed x-chain as the golden model
  (golden/pairing.py final_exponentiation) with Granger-Scott squarings,
  its five exponentiations-by-x as bit scans.

The only data-dependent-depth piece is one Fp Fermat inversion inside the
easy part (fp12_inv), a fixed 381-step chain.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..golden.field import BLS_X
from . import limbs as L
from . import tower as T2
from .fields import FP

_X_BITS = [(BLS_X >> i) & 1 for i in range(BLS_X.bit_length() - 2, -1, -1)]

# b3 on the twist: 3 * 4(1+u) = 12 + 12u.
def _b3(shape=()):
    return T2.fp2_const(12, 12, shape)


def _tmap(fn, *trees):
    """Map a leaf function over identically-shaped nested tuples."""
    if isinstance(trees[0], tuple):
        return tuple(_tmap(fn, *parts) for parts in zip(*trees))
    return fn(*trees)


def _select_tree(mask, a, b):
    return _tmap(lambda x, y: L.select(mask, x, y), a, b)


# ---------------------------------------------------------------------------
# G2 projective steps (RCB algorithms 8-9 over Fp2)
# ---------------------------------------------------------------------------


def _g2_double(t):
    x, y, z = t
    b3 = _b3(x[0].shape[:-1])
    t0 = T2.fp2_sqr(y)
    z3 = T2.fp2_double(T2.fp2_double(T2.fp2_double(t0)))  # 8Y^2
    t1 = T2.fp2_mul(y, z)
    t2 = T2.fp2_mul(b3, T2.fp2_sqr(z))
    x3 = T2.fp2_mul(t2, z3)
    y3 = T2.fp2_add(t0, t2)
    z3 = T2.fp2_mul(t1, z3)
    t1 = T2.fp2_double(t2)
    t2 = T2.fp2_add(t1, t2)
    t0 = T2.fp2_sub(t0, t2)
    y3 = T2.fp2_add(x3, T2.fp2_mul(t0, y3))
    x3 = T2.fp2_double(T2.fp2_mul(t0, T2.fp2_mul(x, y)))
    return (x3, y3, z3)


def _g2_madd(t, q):
    """t projective + q affine (x2, y2), q never infinity (RCB alg 8)."""
    x1, y1, z1 = t
    x2, y2 = q
    b3 = _b3(x1[0].shape[:-1])
    t0 = T2.fp2_mul(x1, x2)
    t1 = T2.fp2_mul(y1, y2)
    t3 = T2.fp2_sub(
        T2.fp2_mul(T2.fp2_add(x1, y1), T2.fp2_add(x2, y2)), T2.fp2_add(t0, t1)
    )
    t4 = T2.fp2_add(T2.fp2_mul(y2, z1), y1)
    t5 = T2.fp2_add(T2.fp2_mul(x2, z1), x1)
    three_t0 = T2.fp2_add(T2.fp2_double(t0), t0)
    bt2 = T2.fp2_mul(b3, z1)
    z3t = T2.fp2_add(t1, bt2)
    t1m = T2.fp2_sub(t1, bt2)
    y3t = T2.fp2_mul(b3, t5)
    x3 = T2.fp2_sub(T2.fp2_mul(t3, t1m), T2.fp2_mul(t4, y3t))
    y3 = T2.fp2_add(T2.fp2_mul(y3t, three_t0), T2.fp2_mul(t1m, z3t))
    z3 = T2.fp2_add(T2.fp2_mul(z3t, t4), T2.fp2_mul(three_t0, t3))
    return (x3, y3, z3)


# ---------------------------------------------------------------------------
# Sparse line multiplication
# ---------------------------------------------------------------------------


def _fp6_mul_sparse01(a, y1, y2):
    """(x0 + x1 v + x2 v^2) * (y1 v + y2 v^2)."""
    x0, x1, x2 = a
    m11 = T2.fp2_mul(x1, y1)
    m22 = T2.fp2_mul(x2, y2)
    c0 = T2.fp2_mul_by_xi(
        T2.fp2_sub(
            T2.fp2_mul(T2.fp2_add(x1, x2), T2.fp2_add(y1, y2)),
            T2.fp2_add(m11, m22),
        )
    )
    c1 = T2.fp2_add(T2.fp2_mul(x0, y1), T2.fp2_mul_by_xi(m22))
    c2 = T2.fp2_add(T2.fp2_mul(x0, y2), m11)
    return (c0, c1, c2)


def fp12_mul_by_line(f, c00, c11, c12):
    """f * ((c00, 0, 0) + (0, c11, c12) w) - the sparse Fp12 shape every
    line function produces (golden/pairing.py:36-49)."""
    a0, a1 = f
    t0 = T2.fp6_mul_fp2(a0, c00)
    t1 = _fp6_mul_sparse01(a1, c11, c12)
    sum_b = (c00, c11, c12)
    c1 = T2.fp6_sub(
        T2.fp6_sub(T2.fp6_mul(T2.fp6_add(a0, a1), sum_b), t0), t1
    )
    c0 = T2.fp6_add(t0, T2.fp6_mul_by_v(t1))
    return (c0, c1)


# ---------------------------------------------------------------------------
# Miller loop (batched, inversion-free)
# ---------------------------------------------------------------------------


def tangent_line_coeffs(t, xp, yp):
    """Sparse line coefficients of the tangent at projective t, scaled by
    2YZ^2 (the scale is an Fp2 factor annihilated by the final
    exponentiation):
      c00 = xi * 2YZ^2 * yP ; c11 = 3X^3 - 2Y^2 Z ; c12 = -3X^2 Z * xP
    """
    x, y, z = t
    xx = T2.fp2_sqr(x)
    yz = T2.fp2_mul(y, z)
    two_yz2 = T2.fp2_double(T2.fp2_mul(yz, z))
    three_xx = T2.fp2_add(T2.fp2_double(xx), xx)
    c00 = T2.fp2_mul_fp(T2.fp2_mul_by_xi(two_yz2), yp)
    c11 = T2.fp2_sub(
        T2.fp2_mul(three_xx, x), T2.fp2_double(T2.fp2_mul(T2.fp2_sqr(y), z))
    )
    c12 = T2.fp2_neg(T2.fp2_mul_fp(T2.fp2_mul(three_xx, z), xp))
    return c00, c11, c12


def chord_line_coeffs(t, q, xp, yp):
    """Sparse line coefficients of the chord through projective t and affine
    q, scaled by D = x2 Z - X:
      c00 = xi D yP ; c11 = N x2 - y2 D ; c12 = -N xP   (N = y2 Z - Y)
    """
    x, y, z = t
    nn = T2.fp2_sub(T2.fp2_mul(q[1], z), y)
    dd = T2.fp2_sub(T2.fp2_mul(q[0], z), x)
    a00 = T2.fp2_mul_fp(T2.fp2_mul_by_xi(dd), yp)
    a11 = T2.fp2_sub(T2.fp2_mul(nn, q[0]), T2.fp2_mul(q[1], dd))
    a12 = T2.fp2_neg(T2.fp2_mul_fp(nn, xp))
    return a00, a11, a12


def miller_step(f, t, q, xp, yp):
    """One Miller-loop iteration minus the bit select (extracted so the
    step body is testable on CPU without compiling the 63-step scan —
    tests/test_ops_pairing.py diffs it against the golden model).

    Returns ``(f_dbl, t_dbl, f_add, t_add)``: the (f, t) state after the
    square + tangent line + double, and the same state with the chord line
    + mixed addition with q additionally applied (taken when the scan's
    current exponent bit is 1)."""
    c00, c11, c12 = tangent_line_coeffs(t, xp, yp)
    f_dbl = fp12_mul_by_line(T2.fp12_sqr(f), c00, c11, c12)
    t_dbl = _g2_double(t)

    a00, a11, a12 = chord_line_coeffs(t_dbl, q, xp, yp)
    f_add = fp12_mul_by_line(f_dbl, a00, a11, a12)
    t_add = _g2_madd(t_dbl, q)
    return f_dbl, t_dbl, f_add, t_add


miller_step_kernel = jax.jit(miller_step)


@jax.jit
def miller_loop_kernel(xp, yp, qx, qy, active):
    """Batched f_{x,Q}(P) (conjugated, x < 0 - golden/pairing.py:52-86).

    xp/yp: [B, l] Fp (Montgomery) G1 affine coordinates; qx/qy: Fp2 pairs of
    [B, l] G2 affine coordinates; active: bool [B] - lanes with an infinity
    argument yield 1 (matching blst; golden/pairing.py:58-59).
    """
    shape = xp.shape[:-1]
    q = ((qx[0], qx[1]), (qy[0], qy[1]))
    f = T2.fp12_one(shape)
    t = (q[0], q[1], T2.fp2_one(shape))
    bits = jnp.asarray(np.array(_X_BITS, dtype=np.uint32))

    def step(carry, bit):
        f, t = carry
        f_dbl, t_dbl, f_add, t_add = miller_step(f, t, q, xp, yp)
        takebit = jnp.broadcast_to(bit != 0, shape)
        f = _select_tree(takebit, f_add, f_dbl)
        t = _select_tree(takebit, t_add, t_dbl)
        return (f, t), None

    (f, _t), _ = lax.scan(step, (f, t), bits)
    f = T2.fp12_conj(f)  # x < 0
    return _select_tree(active, f, T2.fp12_one(shape))


# ---------------------------------------------------------------------------
# Final exponentiation (cubed x-chain, mirrors golden/pairing.py)
# ---------------------------------------------------------------------------

_ABS_X_BITS = tuple(_X_BITS)  # bits of |x| below the MSB, MSB first


@partial(jax.jit, static_argnums=1)
def _exp_by_x_with_bits(m, abs_x_bits: tuple):
    """m^(-|x|) for cyclotomic m via square-and-multiply over the given
    MSB-first bit tuple (below the implicit leading 1), conjugating at the
    end (the cyclotomic inverse; x < 0).  The exponent bits are a STATIC
    argument so the structure test can run this exact compiled scan body
    with a tiny substitute exponent off-TPU (VERDICT round-3 item 5) —
    production passes ``_ABS_X_BITS``."""
    bits = jnp.asarray(np.array(abs_x_bits, dtype=np.uint32))

    def step(r, bit):
        r = T2.fp12_cyclo_sqr(r)
        rm = T2.fp12_mul(r, m)
        shape = r[0][0][0].shape[:-1]
        r = _select_tree(jnp.broadcast_to(bit != 0, shape), rm, r)
        return r, None

    r, _ = lax.scan(step, m, bits)
    return T2.fp12_conj(r)


def _exp_by_x_kernel(m):
    """m^x (x < 0) via cyclotomic square-and-multiply.  Compiled ONCE and
    dispatched five times by ``final_exponentiation`` - inlining five copies
    of this scan into a single program makes XLA compile times explode."""
    return _exp_by_x_with_bits(m, _ABS_X_BITS)


@jax.jit
def _easy_part_kernel(f):
    """Combine the two Miller values and apply the easy part:
    (f0 * f1)^((p^6 - 1)(p^2 + 1))."""
    f0 = _tmap(lambda v: v[0], f)
    f1 = _tmap(lambda v: v[1], f)
    x = T2.fp12_mul(f0, f1)
    m = T2.fp12_mul(T2.fp12_conj(x), T2.fp12_inv(x))
    return T2.fp12_mul(T2.fp12_frobenius_n(m, 2), m)


@jax.jit
def _mul_conj_kernel(a, b):
    return T2.fp12_mul(a, T2.fp12_conj(b))


@jax.jit
def _mul_frob_kernel(a, b):
    return T2.fp12_mul(a, T2.fp12_frobenius(b))


def _hard_tail_expr(e5, w1, m):
    """y = e5 * frob^2(w1) * conj(w1);  result = y * m^3 (the final value
    of the cubed hard part; golden/pairing.py final_exponentiation)."""
    y = T2.fp12_mul(
        T2.fp12_mul(e5, T2.fp12_frobenius_n(w1, 2)), T2.fp12_conj(w1)
    )
    return T2.fp12_mul(y, T2.fp12_mul(T2.fp12_cyclo_sqr(m), m))


@jax.jit
def _hard_tail_kernel(e5, w1, m):
    return T2.fp12_is_one(_hard_tail_expr(e5, w1, m))


_hard_tail_value_kernel = jax.jit(_hard_tail_expr)  # structure-test entry


def _final_exp_hard_chain(m, exp_by_x):
    """The five-exponentiation x-chain of the hard part — m^((x-1)^2),
    then ^(x+p), then ^(x^2) — returning ``(e5, w1)`` for the tail.  ONE
    function holds the chain order / conjugation / Frobenius placement;
    production (``pairings_verify_kernel``) and the tiny-exponent structure
    test (tests/test_ops_pairing.py) both compose through it, so a
    composition regression is caught off-TPU."""
    u = _mul_conj_kernel(exp_by_x(m), m)  # m^(x-1)
    u = _mul_conj_kernel(exp_by_x(u), u)  # m^((x-1)^2)
    w1 = _mul_frob_kernel(exp_by_x(u), u)  # ^(x+p)
    e5 = exp_by_x(exp_by_x(w1))
    return e5, w1


# ---------------------------------------------------------------------------
# The pairing check
# ---------------------------------------------------------------------------


def pairings_verify_kernel(xp, yp, qx, qy, active):
    """e(P0, Q0) * e(P1, Q1) == 1 with P0 pre-negated by the caller -
    exactly the reference's shape (utils.rs:189-214).  Composed from
    separately-jitted stages (one Miller scan, one easy part, five
    dispatches of the shared exp-by-x scan, small combines) to keep each
    XLA program's compile time bounded.  Returns a scalar bool tensor."""
    f = miller_loop_kernel(xp, yp, qx, qy, active)
    m = _easy_part_kernel(f)
    e5, w1 = _final_exp_hard_chain(m, _exp_by_x_kernel)
    return _hard_tail_kernel(e5, w1, m)


def pairings_verify_device(a1, a2, b1, b2) -> bool:
    """Host-facing wrapper over golden affine int points (None == infinity);
    drop-in equivalent of golden pairing.pairings_verify."""
    from ..golden import curve as gc

    rr = FP.mont_r
    p_pts = [gc.g1_neg(a1), b1]
    q_pts = [a2, b2]
    xp = np.zeros((2, FP.nlimbs), np.uint32)
    yp = np.zeros((2, FP.nlimbs), np.uint32)
    qx0 = np.zeros((2, FP.nlimbs), np.uint32)
    qx1 = np.zeros((2, FP.nlimbs), np.uint32)
    qy0 = np.zeros((2, FP.nlimbs), np.uint32)
    qy1 = np.zeros((2, FP.nlimbs), np.uint32)
    active = np.zeros(2, bool)
    for i in range(2):
        p, q = p_pts[i], q_pts[i]
        if p is None or q is None:
            continue
        active[i] = True
        xp[i] = L.int_to_limbs(FP.nlimbs, (p[0] * rr) % FP.modulus)
        yp[i] = L.int_to_limbs(FP.nlimbs, (p[1] * rr) % FP.modulus)
        qx0[i] = L.int_to_limbs(FP.nlimbs, (q[0][0] * rr) % FP.modulus)
        qx1[i] = L.int_to_limbs(FP.nlimbs, (q[0][1] * rr) % FP.modulus)
        qy0[i] = L.int_to_limbs(FP.nlimbs, (q[1][0] * rr) % FP.modulus)
        qy1[i] = L.int_to_limbs(FP.nlimbs, (q[1][1] * rr) % FP.modulus)
    out = pairings_verify_kernel(
        jnp.asarray(xp),
        jnp.asarray(yp),
        (jnp.asarray(qx0), jnp.asarray(qx1)),
        (jnp.asarray(qy0), jnp.asarray(qy1)),
        jnp.asarray(active),
    )
    return bool(np.asarray(out))
