"""Branch-free BLS12-381 G1 arithmetic on limb tensors (device path).

Re-expresses the blst Jacobian point ops the reference calls through FFI
(reference: src/utils.rs:126-183 ``g1_mul/g1_sub``; src/utils.rs:329-410
lincombs; SURVEY.md section 2.3) as fixed-shape JAX programs over the Fp
limb representation from :mod:`kzg_rust_tpu.ops.limbs`.

Representation: a point batch is one ``uint32`` tensor ``[..., 3, NLIMBS_FP]``
holding HOMOGENEOUS PROJECTIVE ``(X, Y, Z)`` coordinates in Montgomery form
(x = X/Z, y = Y/Z); the point at infinity is ``(0, 1, 0)``.  Addition and
doubling use the Renes-Costello-Batina exception-free formulas for a = 0
curves (eprint 2015/1060, algorithms 7-9): complete on ALL inputs -
infinity operands, P + P, P + (-P) - with no masks and no branches, which
is exactly what vectorization over thousands of lanes needs (SURVEY.md
section 7 "hard parts" #3).  Costs: add 12M, mixed add 11M, double 8M,
versus ~16M + 7M-doubling + three masked selects for branching Jacobian.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..golden import curve as gcurve
from ..golden.field import P
from . import limbs as L
from .fields import FP

# b3 = 3 * b = 12 for y^2 = x^3 + 4, stored in Montgomery form.
_B3_MONT = L.int_to_limbs(
    FP.nlimbs, (12 * ((1 << (L.BASE_BITS * FP.nlimbs)) % P)) % P
)

# GLV endomorphism constant: beta a primitive cube root of unity in Fp
# (phi(x, y) = (beta x, y) = [lam](x, y); see golden/curve.py g1_in_subgroup),
# stored in Montgomery form.  Shared by the verification stage-2 kernels and
# the GLV fixed-base MSM.
BETA_MONT = L.int_to_limbs(
    FP.nlimbs,
    (pow(2, (P - 1) // 3, P) * ((1 << (L.BASE_BITS * FP.nlimbs)) % P)) % P,
)


# ---------------------------------------------------------------------------
# Host codecs: golden affine int points <-> device projective Montgomery limbs
# ---------------------------------------------------------------------------


def points_to_proj(points) -> np.ndarray:
    """List of golden affine points ((x, y) ints, None == infinity) ->
    ``[N, 3, NLIMBS_FP]`` uint32 projective Montgomery limbs."""
    n = len(points)
    rr = (1 << (L.BASE_BITS * FP.nlimbs)) % P  # mont(1) as int
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(0)
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


def proj_to_points(arr, mont: bool = True) -> list:
    """``[N, 3, NLIMBS_FP]`` device projective limbs -> list of golden
    affine int points (None == infinity).  ``mont=False`` when the kernel
    already converted out of Montgomery form (fused prover kernels).
    Host-side conversion; used only on small outputs (MSM results), so
    plain bigint inversion is fine."""
    arr = np.asarray(arr)
    # Montgomery -> canonical on host (a device dispatch for two points
    # would cost a full link round-trip on tunneled devices).
    rinv = pow(FP.mont_r, -1, P) if mont else 1
    out = []
    for i in range(arr.shape[0]):
        x = L.limbs_to_int(arr[i, 0]) * rinv % P
        y = L.limbs_to_int(arr[i, 1]) * rinv % P
        z = L.limbs_to_int(arr[i, 2]) * rinv % P
        if z == 0:
            out.append(None)
            continue
        zinv = pow(z, -1, P)
        out.append(((x * zinv) % P, (y * zinv) % P))
    return out


def proj_infinity(shape=()) -> jnp.ndarray:
    """An infinity-point tensor (0, 1, 0) of batch shape ``shape``."""
    one = np.asarray(FP.one_mont)
    zero = np.zeros_like(one)
    pt = np.stack([zero, one, zero], axis=0)
    return jnp.broadcast_to(jnp.asarray(pt), tuple(shape) + (3, FP.nlimbs))


# ---------------------------------------------------------------------------
# Exception-free point ops (RCB algorithms 7-9, a = 0)
# ---------------------------------------------------------------------------


def point_select(mask, p, q):
    """where(mask, p, q) with the (coord, limb) axes broadcast."""
    return jnp.where(mask[..., None, None], p, q)


def point_is_inf(p):
    return L.is_zero(p[..., 2, :])


def point_neg(p):
    y = L.neg_mod(FP, p[..., 1, :])
    return jnp.stack([p[..., 0, :], y, p[..., 2, :]], axis=-2)


def proj_add(p, q):
    """Complete projective addition (RCB eprint 2015/1060 algorithm 7,
    a = 0, 12M).  Valid for every input pair - no special cases exist.

    Interior sums that only feed a Montgomery multiply use lazy reduction
    (``L.relaxed_add``: 3 ops vs ~30) - the multiplies' column bounds and
    REDC absorb the relaxed digits and re-canonicalize.  Sums feeding a
    subtraction, and the three output coordinates, stay canonical (the
    borrow chains and downstream ``eq``/``is_zero`` checks require
    canonical digit patterns)."""
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    mul = lambda u, v: L.mont_mul(FP, u, v)
    add = lambda u, v: L.add_mod(FP, u, v)
    radd = L.relaxed_add
    sub = lambda u, v: L.sub_mod(FP, u, v)
    b3 = jnp.asarray(_B3_MONT)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = sub(mul(radd(x1, y1), radd(x2, y2)), add(t0, t1))  # X1Y2 + X2Y1
    t4 = sub(mul(radd(y1, z1), radd(y2, z2)), add(t1, t2))  # Y1Z2 + Y2Z1
    t5 = sub(mul(radd(x1, z1), radd(x2, z2)), add(t0, t2))  # X1Z2 + X2Z1
    three_t0 = radd(radd(t0, t0), t0)
    bt2 = mul(b3, t2)
    z3t = radd(t1, bt2)
    t1m = sub(t1, bt2)
    y3t = mul(b3, t5)
    x3 = sub(mul(t3, t1m), mul(t4, y3t))
    y3 = add(mul(y3t, three_t0), mul(t1m, z3t))
    z3 = add(mul(z3t, t4), mul(three_t0, t3))
    return jnp.stack([x3, y3, z3], axis=-2)


def proj_add_mixed(p, q_affine):
    """Complete mixed addition (RCB algorithm 8, a = 0, 11M): ``q_affine``
    is ``[..., 2, l]`` affine Montgomery (X2, Y2), implicitly Z2 = 1, and
    must NOT be the point at infinity (table points never are)."""
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2 = q_affine[..., 0, :], q_affine[..., 1, :]
    mul = lambda u, v: L.mont_mul(FP, u, v)
    radd = L.relaxed_add
    sub = lambda u, v: L.sub_mod(FP, u, v)
    b3 = jnp.asarray(_B3_MONT)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = sub(mul(radd(x1, y1), radd(x2, y2)), L.add_mod(FP, t0, t1))
    t4 = radd(mul(y2, z1), y1)  # Y1 + Y2Z1, feeds muls only
    t5 = radd(mul(x2, z1), x1)  # X1 + X2Z1, feeds muls only
    three_t0 = radd(radd(t0, t0), t0)
    bt2 = mul(b3, z1)
    z3t = radd(t1, bt2)
    t1m = sub(t1, bt2)
    y3t = mul(b3, t5)
    x3 = sub(mul(t3, t1m), mul(t4, y3t))
    y3 = L.add_mod(FP, mul(y3t, three_t0), mul(t1m, z3t))
    z3 = L.add_mod(FP, mul(z3t, t4), mul(three_t0, t3))
    return jnp.stack([x3, y3, z3], axis=-2)


def proj_double(p):
    """Exception-free projective doubling (RCB algorithm 9, a = 0, 8M).
    Lazy-reduction policy as in :func:`proj_add`."""
    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    mul = lambda u, v: L.mont_mul(FP, u, v)
    add = lambda u, v: L.add_mod(FP, u, v)
    radd = L.relaxed_add
    sub = lambda u, v: L.sub_mod(FP, u, v)
    b3 = jnp.asarray(_B3_MONT)

    t0 = mul(y, y)
    t00 = radd(t0, t0)
    z3 = radd(radd(t00, t00), radd(t00, t00))  # 8Y^2, feeds muls only
    t1 = mul(y, z)
    t2 = mul(b3, mul(z, z))
    x3 = mul(t2, z3)
    y3 = radd(t0, t2)  # feeds mul(t0, y3) only
    z3 = mul(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)  # feeds sub: canonical digits required
    t0 = sub(t0, t2)
    y3 = add(x3, mul(t0, y3))
    x3 = mul(t0, mul(x, y))
    x3 = add(x3, x3)
    return jnp.stack([x3, y3, z3], axis=-2)


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
        init = proj_infinity((n // scan_rows,))
        acc = lax.scan(lambda a, r: (proj_add(a, r), None), init, rows)[0]
        points = acc
        n = points.shape[0]
    # Pad to a power of two with infinity (additive identity).
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = proj_infinity((m - n,))
        points = jnp.concatenate([points, pad], axis=0)
    while points.shape[0] > 1:
        half = points.shape[0] // 2
        points = proj_add(points[:half], points[half:])
    return points[0]


def fold_reduce(points, fold: int):
    """Sum ``[N, 3, nlimbs]`` points to one, with only TWO distinct add
    shapes in the compiled program (an unrolled ``tree_reduce`` instantiates
    a fresh XLA computation per level width, which is compile-time death for
    the wide complete add).

    Stage 1 folds N down to ``fold`` with a ``lax.scan`` of row adds (one
    add at width ``fold`` in the body).  Stage 2 runs a fixed-width ladder
    in a ``fori_loop``: each step adds the even- and odd-strided halves and
    pads the tail with infinity, keeping live partial sums in a prefix -
    same shapes every iteration, so XLA compiles the ~width-``fold/2`` add
    exactly once.  Total work: ~N + fold adds.  (A halving-width ladder
    was tried in round 3 and measured ~30% SLOWER on device despite doing
    half the arithmetic - the shrinking widths are per-op-overhead-bound;
    tools/probe_msm.py.)
    """
    from jax import lax

    n = points.shape[0]
    assert fold >= 2 and (fold & (fold - 1)) == 0, "fold must be a power of 2"
    if n % fold != 0 or n < fold:
        pad = (-n) % fold if n > fold else fold - n
        points = jnp.concatenate([points, proj_infinity((pad,))], axis=0)
        n = points.shape[0]
    if n > fold:
        rows = points.reshape(n // fold, fold, 3, FP.nlimbs)
        init = proj_infinity((fold,))
        buf = lax.scan(lambda a, r: (proj_add(a, r), None), init, rows)[0]
    else:
        buf = points
    half_inf = proj_infinity((fold // 2,))
    levels = fold.bit_length() - 1  # log2(fold)

    def body(_, b):
        s = proj_add(b[0::2], b[1::2])
        return jnp.concatenate([s, half_inf], axis=0)

    buf = lax.fori_loop(0, levels, body, buf)
    return buf[0]


def affine_pair_add(p_aff, q_aff, v1, v2):
    """Complete-by-masking AFFINE pairwise addition over [M, 2, l] halves
    with validity masks — Montgomery-batched inversion shared across the
    full lane width (one product tree + ONE Fermat inversion per call), so
    each both-valid add costs ~4 multiplies plus a ~3-multiply inversion
    share, versus 11M for the mixed projective add (VERDICT round-4
    item 3; reference hot kernel: utils.rs:367-410).

    Cases (exactness relies on table points never having y = 0 — the G1
    cofactor is odd, so no 2-torsion exists on the curve):
      both valid, x1 != x2          chord:    lam = (y2-y1)/(x2-x1)
      both valid, equal points      tangent:  lam = 3 x1^2 / (2 y1)
      both valid, P + (-P)          result invalid (infinity)
      one valid                     passthrough of the valid half
      none valid                    invalid
    Returns ``(out_aff [M, 2, l], out_valid [M])``.
    """
    x1, y1 = p_aff[..., 0, :], p_aff[..., 1, :]
    x2, y2 = q_aff[..., 0, :], q_aff[..., 1, :]
    both = v1 & v2
    samex = L.eq(x1, x2) & both
    dbl = samex & L.eq(y1, y2)
    kill = samex & ~L.eq(y1, y2)  # P + (-P)

    two_y1 = L.add_mod(FP, y1, y1)
    den = L.select(dbl, two_y1, L.sub_mod(FP, x2, x1))
    # Lanes whose denominator is zero (kill lanes, invalid-garbage lanes)
    # would zero the whole product tree; substitute mont(1).
    usable = both & ~kill
    den = L.select(usable, den, jnp.broadcast_to(jnp.asarray(FP.one_mont), den.shape))
    dinv = L.batch_mont_inv(FP, den, axis=0)

    xx = L.mont_mul(FP, x1, x1)
    three_xx = L.add_mod(FP, L.add_mod(FP, xx, xx), xx)
    num = L.select(dbl, three_xx, L.sub_mod(FP, y2, y1))
    lam = L.mont_mul(FP, num, dinv)
    x3 = L.sub_mod(FP, L.sub_mod(FP, L.mont_mul(FP, lam, lam), x1), x2)
    y3 = L.sub_mod(FP, L.mont_mul(FP, lam, L.sub_mod(FP, x1, x3)), y1)
    added = jnp.stack([x3, y3], axis=-2)

    out = point2_select(usable, added, point2_select(v1, p_aff, q_aff))
    return out, (v1 | v2) & ~kill


def point2_select(mask, p, q):
    """where(mask, p, q) for [., 2, l] affine pairs."""
    return jnp.where(mask[..., None, None], p, q)


def affine_tree_levels(points_aff, valid, k: int):
    """k binary-tree levels of :func:`affine_pair_add` over [N, 2, l]
    (N must stay even through every level): halves the lane count per
    level at ~7 effective multiplies per surviving add (vs 11M mixed),
    paying one Fermat inversion per level — the measured trade is in
    SCALING.md ("MSM batched-affine fold", round 4)."""
    for _ in range(k):
        n = points_aff.shape[0]
        # Explicit raise (not assert) so the invariant survives python -O —
        # same pattern as limbs.sum_mont_redc's term-count guard.
        if n % 2 != 0:
            raise ValueError("affine tree level needs an even lane count")
        points_aff, valid = affine_pair_add(
            points_aff[0::2], points_aff[1::2], valid[0::2], valid[1::2]
        )
    return points_aff, valid


def fold_reduce_mixed(points_aff, valid, fold: int, aff_levels: int = 0):
    """Sum ``[N, 2, nlimbs]`` AFFINE Montgomery points (lanes with
    ``valid == False`` are skipped) to one projective point.

    Same two-compiled-shape structure as :func:`fold_reduce`, but the
    accumulation scan uses the 11M complete MIXED add instead of the 12M
    projective add — affine table entries cannot encode infinity, so skipped
    lanes (zero MSM digits, infinity base points) are handled by computing
    the add unconditionally and selecting the untouched accumulator, which
    costs one masked select instead of a point add.  Garbage in invalid
    lanes is safe as long as the limbs are canonical (the formulas stay in
    range; the result is discarded by the select).

    ``aff_levels > 0`` first pre-reduces with that many Montgomery-batched
    affine tree levels (:func:`affine_tree_levels`): ~7 effective muls per
    add instead of 11, at one Fermat inversion of sequential depth per
    level — measured trade in SCALING.md ("MSM batched-affine fold").
    """
    from jax import lax

    if aff_levels:
        points_aff, valid = affine_tree_levels(points_aff, valid, aff_levels)
    n = points_aff.shape[0]
    assert fold >= 2 and (fold & (fold - 1)) == 0, "fold must be a power of 2"
    if n % fold != 0 or n < fold:
        pad = (-n) % fold if n > fold else fold - n
        zrow = jnp.zeros((pad,) + points_aff.shape[1:], points_aff.dtype)
        points_aff = jnp.concatenate([points_aff, zrow], axis=0)
        valid = jnp.concatenate(
            [valid, jnp.zeros((pad,), dtype=valid.dtype)], axis=0
        )
        n = points_aff.shape[0]
    rows = points_aff.reshape(n // fold, fold, 2, FP.nlimbs)
    vrows = valid.reshape(n // fold, fold)
    init = proj_infinity((fold,))

    def step(acc, rv):
        row, v = rv
        return point_select(v, proj_add_mixed(acc, row), acc), None

    buf = lax.scan(step, init, (rows, vrows))[0]
    half_inf = proj_infinity((fold // 2,))
    levels = fold.bit_length() - 1

    def body(_, b):
        s = proj_add(b[0::2], b[1::2])
        return jnp.concatenate([s, half_inf], axis=0)

    buf = lax.fori_loop(0, levels, body, buf)
    return buf[0]


# Back-compat aliases for the Jacobian-era names (same complete semantics).
jacobian_add = proj_add
jacobian_double = proj_double
jacobian_infinity = proj_infinity
points_to_jacobian = points_to_proj
jacobian_to_points = proj_to_points


# ---------------------------------------------------------------------------
# Reference checks against the golden model (used by tests)
# ---------------------------------------------------------------------------


def golden_check_add(p_int, q_int):  # pragma: no cover - test helper
    return gcurve.g1_add(p_int, q_int)
