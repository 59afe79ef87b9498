"""Branch-free BLS12-381 G1 arithmetic on limb tensors (device path).

Re-expresses the blst Jacobian point ops the reference calls through FFI
(reference: src/utils.rs:126-183 ``g1_mul/g1_sub``; src/utils.rs:329-410
lincombs; SURVEY.md section 2.3) as fixed-shape JAX programs over the Fp
limb representation from :mod:`kzg_rust_tpu.ops.limbs`.

Representation: a point batch is one ``uint32`` tensor ``[..., 3, NLIMBS_FP]``
holding Jacobian ``(X, Y, Z)`` coordinates in Montgomery form.  The point at
infinity is encoded as ``Z == 0`` (with ``X = Y = mont(1)``), so every edge
case (infinity operands, doubling, inverse pairs) is handled by masked
selects instead of branches - the vmap/vectorization requirement the
reference's host code never had (SURVEY.md section 7 "hard parts" #3).

BLS12-381 G1 has no 2-torsion (the cofactor is odd), so no on-curve point
has ``y == 0`` and the a=0 doubling formula is complete on curve points.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..golden import curve as gcurve
from ..golden.field import P
from . import limbs as L
from .fields import FP


# ---------------------------------------------------------------------------
# Host codecs: golden affine int points <-> device Jacobian Montgomery limbs
# ---------------------------------------------------------------------------


def points_to_jacobian(points) -> np.ndarray:
    """List of golden affine points ((x, y) ints, None == infinity) ->
    ``[N, 3, NLIMBS_FP]`` uint32 Jacobian Montgomery limbs."""
    n = len(points)
    rr = (1 << (L.BASE_BITS * FP.nlimbs)) % P  # mont(1) as int
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(rr)
            ys.append(rr)
            zs.append(0)
        else:
            xs.append((p[0] * rr) % P)
            ys.append((p[1] * rr) % P)
            zs.append(rr)
    out = np.empty((n, 3, FP.nlimbs), dtype=np.uint32)
    out[:, 0, :] = L.ints_to_limbs(FP.nlimbs, xs)
    out[:, 1, :] = L.ints_to_limbs(FP.nlimbs, ys)
    out[:, 2, :] = L.ints_to_limbs(FP.nlimbs, zs)
    return out


def jacobian_to_points(arr) -> list:
    """``[N, 3, NLIMBS_FP]`` device Jacobian Montgomery limbs -> list of
    golden affine int points (None == infinity).  Host-side conversion; used
    only on small outputs (MSM results), so plain bigint inversion is fine."""
    arr = np.asarray(L.from_mont(FP, jnp.asarray(arr)))
    out = []
    for i in range(arr.shape[0]):
        x = L.limbs_to_int(arr[i, 0])
        y = L.limbs_to_int(arr[i, 1])
        z = L.limbs_to_int(arr[i, 2])
        if z == 0:
            out.append(None)
            continue
        zinv = pow(z, -1, P)
        zinv2 = (zinv * zinv) % P
        out.append(((x * zinv2) % P, (y * zinv2 * zinv) % P))
    return out


def jacobian_infinity(shape=()) -> jnp.ndarray:
    """An infinity-point tensor of batch shape ``shape``."""
    one = np.asarray(FP.one_mont)
    pt = np.stack([one, one, np.zeros_like(one)], axis=0)
    return jnp.broadcast_to(jnp.asarray(pt), tuple(shape) + (3, FP.nlimbs))


# ---------------------------------------------------------------------------
# Branch-free point ops
# ---------------------------------------------------------------------------


def point_select(mask, p, q):
    """where(mask, p, q) with the (coord, limb) axes broadcast."""
    return jnp.where(mask[..., None, None], p, q)


def point_is_inf(p):
    return L.is_zero(p[..., 2, :])


def point_neg(p):
    y = L.neg_mod(FP, p[..., 1, :])
    return jnp.stack([p[..., 0, :], y, p[..., 2, :]], axis=-2)


def jacobian_double(p):
    """Complete a=0 Jacobian doubling ("dbl-2009-l").  7 field muls.

    Infinity is preserved for free: Z1 == 0 gives Z3 == 0.
    """
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    mul = lambda u, v: L.mont_mul(FP, u, v)
    add = lambda u, v: L.add_mod(FP, u, v)
    sub = lambda u, v: L.sub_mod(FP, u, v)

    a = mul(x1, x1)
    b = mul(y1, y1)
    c = mul(b, b)
    t = mul(add(x1, b), add(x1, b))
    d = add(sub(sub(t, a), c), sub(sub(t, a), c))  # 2((X+B)^2 - A - C)
    e = add(add(a, a), a)
    f = mul(e, e)
    x3 = sub(f, add(d, d))
    c8 = add(add(add(c, c), add(c, c)), add(add(c, c), add(c, c)))
    y3 = sub(mul(e, sub(d, x3)), c8)
    z3 = add(mul(y1, z1), mul(y1, z1))
    return jnp.stack([x3, y3, z3], axis=-2)


def jacobian_add(p, q):
    """Complete Jacobian addition: handles infinity operands, P + P
    (doubling) and P + (-P) (infinity) via masked selects.  ~16 field muls
    for the generic path plus the 7-mul doubling branch, all lanes computed,
    result selected - the branch-free re-expression of blst's internal
    branching (reference: utils.rs:162-183)."""
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    mul = lambda u, v: L.mont_mul(FP, u, v)
    sub = lambda u, v: L.sub_mod(FP, u, v)
    add = lambda u, v: L.add_mod(FP, u, v)

    inf1 = L.is_zero(z1)
    inf2 = L.is_zero(z2)

    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(mul(y1, z2), z2z2)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub(u2, u1)
    r = sub(s2, s1)

    same_x = L.is_zero(h) & ~inf1 & ~inf2
    dbl_case = same_x & L.is_zero(r)
    inf_case = same_x & ~L.is_zero(r)  # q == -p

    hh = mul(h, h)
    hhh = mul(h, hh)
    v = mul(u1, hh)
    x3 = sub(sub(mul(r, r), hhh), add(v, v))
    y3 = sub(mul(r, sub(v, x3)), mul(s1, hhh))
    z3 = mul(mul(z1, z2), h)
    gen = jnp.stack([x3, y3, z3], axis=-2)

    out = point_select(dbl_case, jacobian_double(p), gen)
    out = point_select(inf_case, jacobian_infinity(out.shape[:-2]), out)
    out = point_select(inf2, p, out)
    out = point_select(inf1, q, out)
    return out


def tree_reduce(points, scan_rows: int = 0):
    """Sum a ``[N, 3, nlimbs]`` point batch to one point ``[3, nlimbs]``.

    Pairwise halving: O(N) total point adds, log2(N) sequential levels, each
    level a full-width vectorized complete add.  ``scan_rows > 0`` first
    folds N down by that factor with a ``lax.scan`` of row-adds (same total
    work, one add in the compiled body) to keep XLA program size bounded for
    large N.
    """
    from jax import lax

    n = points.shape[0]
    if scan_rows > 1 and n % scan_rows == 0 and n > scan_rows:
        rows = points.reshape(scan_rows, n // scan_rows, 3, FP.nlimbs)
        init = jacobian_infinity((n // scan_rows,))
        acc = lax.scan(lambda a, r: (jacobian_add(a, r), None), init, rows)[0]
        points = acc
        n = points.shape[0]
    # Pad to a power of two with infinity (additive identity).
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = jacobian_infinity((m - n,))
        points = jnp.concatenate([points, pad], axis=0)
    while points.shape[0] > 1:
        half = points.shape[0] // 2
        points = jacobian_add(points[:half], points[half:])
    return points[0]


def fold_reduce(points, fold: int):
    """Sum ``[N, 3, nlimbs]`` points to one, with only TWO distinct add
    shapes in the compiled program (the unrolled ``tree_reduce`` instantiates
    a fresh XLA computation per level width, which is compile-time death for
    the ~70k-HLO complete add).

    Stage 1 folds N down to ``fold`` with a ``lax.scan`` of row adds (one
    add at width ``fold`` in the body).  Stage 2 runs a fixed-width ladder
    in a ``fori_loop``: each step adds the even- and odd-strided halves and
    pads the tail with infinity, keeping live partial sums in a prefix -
    same shapes every iteration, so XLA compiles the ~width-``fold/2`` add
    exactly once.  Total work: N + fold*log2(fold)/... ~= N + fold adds.
    """
    from jax import lax

    n = points.shape[0]
    assert fold >= 2 and (fold & (fold - 1)) == 0, "fold must be a power of 2"
    if n % fold != 0 or n < fold:
        pad = (-n) % fold if n > fold else fold - n
        points = jnp.concatenate([points, jacobian_infinity((pad,))], axis=0)
        n = points.shape[0]
    if n > fold:
        rows = points.reshape(n // fold, fold, 3, FP.nlimbs)
        init = jacobian_infinity((fold,))
        buf = lax.scan(lambda a, r: (jacobian_add(a, r), None), init, rows)[0]
    else:
        buf = points
    half_inf = jacobian_infinity((fold // 2,))
    levels = fold.bit_length() - 1  # log2(fold)

    def body(_, b):
        s = jacobian_add(b[0::2], b[1::2])
        return jnp.concatenate([s, half_inf], axis=0)

    buf = lax.fori_loop(0, levels, body, buf)
    return buf[0]


# ---------------------------------------------------------------------------
# Reference checks against the golden model (used by tests)
# ---------------------------------------------------------------------------


def golden_check_add(p_int, q_int):  # pragma: no cover - test helper
    return gcurve.g1_add(p_int, q_int)
