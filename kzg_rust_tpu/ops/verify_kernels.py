"""Batched device kernels for the verification paths.

The reference verifies batches with a per-blob host loop plus three naive
G1 lincombs and per-point subgroup checks (reference: src/kzg.rs:579-693,
src/utils.rs:282-342).  Here the whole path is two device programs shaped
for a vector machine:

Stage 1 — two independent programs over the raw inputs (dispatched async so
the host's Fiat-Shamir SHA-256 work overlaps the device's sequential chain):

``batch_points_kernel`` (needs only the compressed points):
  * G1 decompression of all commitments/proofs on device (Fp sqrt via
    x^((p+1)/4); replaces the blst uncompress FFI, reference utils.rs:282-310);
  * ONE shared doubling chain producing the window bases ``4^j * P`` for
    every parsed point — the only sequential dependency in the whole
    verification, kept at full point-batch width;
  * GLV subgroup checks ``phi(P) == -[z^2]P`` with ``[z^2]P`` assembled from
    those same bases (constant digits - no ladder).

``bary_batch_from_bytes_kernel`` (needs the challenges from the host):
  * fused blob ingest + canonicality + batched barycentric evaluation.

Stage 2 (``batch_stage2_kernel``) — after the host derives the Fiat-Shamir
r-powers from the stage-1 evaluations:
  * every verification lincomb (reference kzg.rs:601-616) as ONE wide
    gather/select/tree-reduce over the precomputed bases, with scalars
    GLV-split and recoded to signed base-4 digits on host
    (:mod:`kzg_rust_tpu.ops.glv`) — sequential depth O(log) instead of the
    255-step double-and-add ladders this module used in round 1;
  * the per-blob generator multiples folded into a single fixed-base
    multiply: sum_i r^i (C_i - [y_i]G) == sum_i r^i C_i - [sum_i r^i y_i]G.

Scalars enter as tiny int8 digit matrices recoded on host; points enter
compressed (48 bytes each) and never cross the link again.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..golden.field import P as _P
from . import curve as C
from . import glv
from . import limbs as L
from . import msm as M
from .fields import FP, FR

NUM_WINDOWS = glv.NUM_WINDOWS_GLV  # 66 base-4 windows per 128-bit GLV half

# GLV endomorphism constant beta (Montgomery form), shared with the GLV
# fixed-base MSM (see golden/curve.py g1_in_subgroup).
_BETA_MONT = C.BETA_MONT
# Signed base-4 digits of z^2 (the subgroup-check scalar), a host constant.
_Z2_DIGITS = glv.recode_base4_signed([glv.Z2])[:, 0]  # [66] int8

# Curve constant b = 4 in Montgomery form (for x^3 + 4 during uncompression).
_B4_MONT = L.int_to_limbs(FP.nlimbs, (4 * ((1 << (L.BASE_BITS * FP.nlimbs)) % _P)) % _P)
# (p+1)/2 as limbs: y is "lexicographically largest" iff y >= (p+1)/2.
_HALF_P1 = L.int_to_limbs(FP.nlimbs, (_P + 1) // 2)


# ---------------------------------------------------------------------------
# Device G1 decompression (reference: utils.rs:282-310 via blst_p1_uncompress)
# ---------------------------------------------------------------------------


def g1_uncompress_points(comp):
    """[N, 48] uint8 ZCash-compressed G1 -> ([N, 3, l] Montgomery projective
    points, ok [N] bool).  Matches golden ``g1_uncompress`` bit-exactly:
    compression bit required, canonical x < p, on-curve (sqrt must exist),
    strict infinity encoding (0xc0 then zeros), sign = y > (p-1)/2.
    Invalid rows yield ok=False (point contents are unspecified)."""
    flags = comp[:, 0].astype(jnp.uint32)
    comp_bit = (flags & 0x80) != 0
    inf_bit = (flags & 0x40) != 0
    sign_bit = (flags & 0x20) != 0
    first = (flags & 0x1F).astype(jnp.uint8)
    be = jnp.concatenate([first[:, None], comp[:, 1:]], axis=1)
    x = L.bytes_le_to_limbs(FP.nlimbs, be[:, ::-1])  # [N, l]
    x_ok = ~L.geq_mod(FP, x)
    # Clamp out-of-range x to 0 so downstream Montgomery ops stay in range
    # (the row is already marked invalid; its point is never trusted).
    x = jnp.where(x_ok[:, None], x, jnp.zeros_like(x))
    xm = L.to_mont(FP, x)
    rhs = L.add_mod(FP, L.mont_mul(FP, xm, L.mont_sqr(FP, xm)), jnp.asarray(_B4_MONT))
    ym = L.mont_pow_const(FP, rhs, (_P + 1) // 4)
    on_curve = L.eq(L.mont_sqr(FP, ym), rhs)
    y_can = L.from_mont(FP, ym)
    y_large = L.geq_const(FP, y_can, _HALF_P1)
    ym = jnp.where((y_large != sign_bit)[:, None], L.neg_mod(FP, ym), ym)

    one_m = jnp.asarray(FP.one_mont)
    zero = jnp.zeros_like(xm)
    inf_enc_ok = (
        inf_bit
        & ~sign_bit
        & (first == 0)
        & jnp.all(comp[:, 1:] == 0, axis=1)
    )
    ok = comp_bit & jnp.where(inf_bit, inf_enc_ok, x_ok & on_curve)

    xo = jnp.where(inf_bit[:, None], zero, xm)
    yo = jnp.where(inf_bit[:, None], jnp.broadcast_to(one_m, xm.shape), ym)
    zo = jnp.where(inf_bit[:, None], zero, jnp.broadcast_to(one_m, xm.shape))
    return jnp.stack([xo, yo, zo], axis=-2), ok


g1_uncompress_kernel = jax.jit(g1_uncompress_points)


# ---------------------------------------------------------------------------
# Shared window-base chain + GLV subgroup check
# ---------------------------------------------------------------------------


def bases_chain(points):
    """[N, 3, l] -> (bases [W, N, 3, l], bases2 [W, N, 3, l]) with
    bases[j] = 4^j * P and bases2[j] = 2 * 4^j * P.  The scan is the single
    sequential dependency of verification; everything downstream is wide.
    The intermediate double of each step IS bases2[j], so both tables come
    out of one chain with zero extra point work."""

    def step(acc, _):
        mid = C.proj_double(acc)
        return C.proj_double(mid), (acc, mid)

    _, (bases, bases2) = lax.scan(step, points, None, length=NUM_WINDOWS)
    return bases, bases2


def _reduce_axis0(points):
    """Tree-sum a [W, ..., 3, l] point tensor over axis 0.  Odd widths
    carry their last lane to the next level instead of padding W up to a
    power of two with infinity — W-1 total adds (optimal) versus up to
    2W-1 with pow2 padding (the round-5 subgroup-check rework made small
    odd widths the common case)."""
    while points.shape[0] > 1:
        half = points.shape[0] // 2
        red = C.proj_add(points[:half], points[half : 2 * half])
        if points.shape[0] % 2:
            red = jnp.concatenate([red, points[2 * half :]], axis=0)
        points = red
    return points[0]


def _select_digit_multiple(bases, bases2, digits):
    """Pick ``d * 4^j * P`` from {B, 2B} for signed digits in {-2..2}:
    magnitude 2 -> 2B, 1 -> B, 0 -> infinity (X=Z=0), sign -> negated Y.
    ``digits`` broadcasts against the leading axes of ``bases``."""
    mag = jnp.abs(digits)
    sel = jnp.where((mag == 2)[..., None, None], bases2, bases)
    x, y, z = sel[..., 0, :], sel[..., 1, :], sel[..., 2, :]
    zero_mask = (mag == 0)[..., None]
    x = jnp.where(zero_mask, jnp.zeros_like(x), x)
    z = jnp.where(zero_mask, jnp.zeros_like(z), z)
    y = jnp.where((digits < 0)[..., None], L.neg_mod(FP, y), y)
    return jnp.stack([x, y, z], axis=-2)


def subgroup_check_from_bases(points, bases, bases2):
    """GLV subgroup membership phi(P) == -[z^2]P for every point, with
    [z^2]P assembled from the shared window bases via the CONSTANT signed
    base-4 digits of z^2 — no per-point ladder.  Infinity passes (matching
    validate_kzg_g1, reference: utils.rs:298-301).  Returns bool [N].

    The digits are a host constant with only 17 of 66 windows nonzero
    (z^2 is the square of the sparse BLS parameter), so the selection is
    STATIC: each nonzero window slices ``bases``/``bases2`` directly (one
    read, no masked dual-tensor select) and zero windows cost nothing —
    16 tree adds per point instead of the 127 a masked 66-window
    pow2-padded reduce paid (measured ~36 ms -> ~4 ms per 1024-blob chunk
    at n=4096, tools/probe_floor4096.py round 5)."""
    parts = []
    for j, d in enumerate(_Z2_DIGITS.tolist()):
        if d == 0:
            continue
        p = (bases2 if abs(d) == 2 else bases)[j]
        if d < 0:
            p = C.point_neg(p)
        parts.append(p)
    z2p = _reduce_axis0(jnp.stack(parts))  # [N, 3, l] = [z^2] P
    phix = L.mont_mul(FP, points[..., 0, :], jnp.asarray(_BETA_MONT))
    phiy = points[..., 1, :]
    phiz = points[..., 2, :]
    x2, y2, z2 = z2p[..., 0, :], L.neg_mod(FP, z2p[..., 1, :]), z2p[..., 2, :]
    eq_x = L.eq(L.mont_mul(FP, phix, z2), L.mont_mul(FP, x2, phiz))
    eq_y = L.eq(L.mont_mul(FP, phiy, z2), L.mont_mul(FP, y2, phiz))
    inf_a = L.is_zero(phiz)
    inf_b = L.is_zero(z2)
    return (eq_x & eq_y & ~inf_a & ~inf_b) | (inf_a & inf_b)


@jax.jit
def subgroup_check_kernel(points):
    """Standalone batched subgroup check (tests; production fuses it into
    ``batch_stage1_kernel``)."""
    bases, bases2 = bases_chain(points)
    return subgroup_check_from_bases(points, bases, bases2)


# ---------------------------------------------------------------------------
# Stage 1 (points): decompress + chain + subgroup, one dispatch
# ---------------------------------------------------------------------------


def batch_points(comp_bytes):
    """comp_bytes [2B, 48] uint8, blob-major (row ``2b`` = commitment b,
    row ``2b+1`` = proof b, matching the stage-2 lane layout; padded rows
    encode infinity) -> (bases, bases2, flags).

    ``bases``/``bases2`` [W, 2B, 3, l] stay device-resident as stage-2
    inputs; ``flags`` [2] uint32 is the tiny host fetch (flag 0: all points
    decode, flag 1: all in subgroup).
    """
    points, dec_ok = g1_uncompress_points(comp_bytes)
    bases, bases2 = bases_chain(points)
    sub_ok = subgroup_check_from_bases(points, bases, bases2)
    flags = jnp.stack([jnp.all(dec_ok), jnp.all(sub_ok)]).astype(jnp.uint32)
    return bases, bases2, flags


batch_points_kernel = jax.jit(batch_points)


# ---------------------------------------------------------------------------
# Stage 2: the RLC combination as one wide gather/reduce
# ---------------------------------------------------------------------------


def stage2_digits(n: int, r_powers, r_times_z) -> np.ndarray:
    """Host recoding of all stage-2 scalars into the [W, 6n] int8 digit
    matrix (GLV split + signed base-4), blob-major so a blob-axis shard is
    self-contained: each blob owns six consecutive lanes
    [proof*k1, proof*k2, comm*k1, comm*k2, proofz*k1, proofz*k2]
    (k2 = the GLV/phi half).  Lanes 0-1 of each blob form the LHS group
    (sum r^i proof_i), lanes 2-5 the RHS group."""
    k1s, k2s = glv.decompose_batch(r_powers)
    q1s, q2s = glv.decompose_batch(r_times_z)
    # Recode only the 4n UNIQUE scalars (the proof and commitment lanes
    # share r^i's halves), then expand to the 6-lane blob-major layout
    # [p*k1, p*k2, c*k1, c*k2, pz*k1, pz*k2] with one np.take — a third
    # of the host recode work on the stage-2 critical path was redundant
    # (round-4 review finding).
    uniq = []
    for i in range(n):
        uniq += [k1s[i], k2s[i], q1s[i], q2s[i]]
    rec = glv.recode_base4_signed(uniq)  # [W, 4n]
    base = 4 * np.arange(n)[:, None]
    idx = (base + np.array([0, 1, 0, 1, 2, 3])[None, :]).reshape(-1)
    return np.ascontiguousarray(rec[:, idx])


# Which of each blob's six lanes multiply the phi half (X scaled by beta).
_PHI_LANES = np.array([False, True, False, True, False, True])


def stage2_partials(bases, bases2, digits):
    """The lincomb partial sums over one (shard of a) batch: select the
    digit multiples from the bases and tree-reduce per lane group.
    digits [W, 6n] blob-major (see ``stage2_digits``).  Returns
    [2, 3, l]: row 0 = sum r^i proof_i, row 1 = sum r^i C_i +
    sum (r^i z_i) proof_i (generator part NOT yet subtracted).

    The lane -> point-row mapping is STATIC (row 2b = commitment b, row
    2b+1 = proof b), so the bases are routed to lanes with strided slices +
    a stack instead of a ``jnp.take`` — XLA gathers lower to near-scalar
    row loads on TPU (see the MSM's masked-reduction select)."""
    n = digits.shape[1] // 6
    w = bases.shape[0]

    def lanes(src):  # [W, 2n, 3, l] -> [W, n, 6, 3, l]
        c = src[:, 0::2]
        p = src[:, 1::2]
        return jnp.stack([p, p, c, c, p, p], axis=2)

    d = digits.astype(jnp.int32).reshape(w, n, 6)
    sel = _select_digit_multiple(lanes(bases), lanes(bases2), d)
    # GLV halves multiply phi(P) = (beta X, Y, Z); phi commutes with
    # doubling and negation, so twisting the selected multiple is exact.
    # The phi lanes are the ODD lane indices (k2 halves, _PHI_LANES), and
    # the lane axis is static — so only those three lanes pay the beta
    # multiply (strided slice + re-interleave), not all six with half the
    # products discarded by a select (round-4 review finding).
    x = sel[..., 0, :]  # [W, n, 6, l]
    xe = x[..., 0::2, :]
    xo = L.mont_mul(FP, x[..., 1::2, :], jnp.asarray(_BETA_MONT))
    x = jnp.stack([xe, xo], axis=-2).reshape(x.shape)
    sel = jnp.concatenate([x[..., None, :], sel[..., 1:, :]], axis=-2)

    lhs_flat = sel[:, :, :2].reshape(w * n * 2, 3, FP.nlimbs)
    rhs_flat = sel[:, :, 2:].reshape(w * n * 4, 3, FP.nlimbs)
    lhs = C.fold_reduce(lhs_flat, _fold_for(w * 2 * n))
    rhs = C.fold_reduce(rhs_flat, _fold_for(w * 4 * n))
    return jnp.stack([lhs, rhs], axis=0)


def gen_mult(gen_table, digits):
    """[s] G via the generator window table: one fixed-base multiply
    (replaces the reference's n per-blob generator multiplies, kzg.rs:603).
    digits [64, 1] signed base-16 (``msm.recode_signed_digits``)."""
    table = gen_table  # [64, 8, 1, 3, l]
    syg = M.select_window_points(table, digits)  # [64, 1, 3, l]
    return _reduce_axis0(syg)[0]  # [3, l]


def batch_stage2(bases, bases2, digits, gen_table, sy_digits):
    """The whole RLC combination (reference: kzg.rs:601-621) as one wide
    program over the stage-1 bases.

    Returns [2, 3, l]: row 0 = sum r^i proof_i, row 1 =
    sum r^i C_i + sum (r^i z_i) proof_i - [sum r^i y_i] G.
    """
    out = stage2_partials(bases, bases2, digits)
    rhs = C.proj_add(out[1], C.point_neg(gen_mult(gen_table, sy_digits)))
    return jnp.stack([out[0], rhs], axis=0)


batch_stage2_kernel = jax.jit(batch_stage2)


def _fold_for(n: int) -> int:
    f = 1
    while f * 2 <= n:
        f *= 2
    return max(2, min(f, 4096))


def build_generator_table():
    """[64, 8, 1, 3, l] window table for the G1 generator (built once)."""
    from ..golden import curve as gc

    pts = C.points_to_jacobian([gc.G1_GENERATOR])
    return M._build_table_kernel(jnp.asarray(pts))


# ---------------------------------------------------------------------------
# Batched barycentric evaluation
# ---------------------------------------------------------------------------


def blob_bytes_to_limbs(by):
    """[..., 32] big-endian uint8 field elements -> [..., NLIMBS_FR] limbs,
    on device (the host uploads raw blob bytes - 3x smaller than limbs)."""
    le = by[..., ::-1]
    flat = le.reshape((-1, 32))
    limbs = L.bytes_le_to_limbs(FR.nlimbs, flat)
    return limbs.reshape(by.shape[:-1] + (FR.nlimbs,))


@partial(jax.jit, static_argnums=0)
def bary_batch_from_bytes_kernel(n: int, roots_m, roots_m2, inv_n_m, blob_bytes, xs):
    """Fused ingest + canonicality check + batched barycentric evaluation:
    blob_bytes [B, n, 32] uint8 BE -> (ys [B, l], ok scalar bool).

    ``ok`` is False iff any field element is >= r (reference rejects such
    blobs, utils.rs:262-275); the ys are garbage in that case and callers
    must raise.  One dispatch, one fetch.
    """
    evals = blob_bytes_to_limbs(blob_bytes)
    ok = ~jnp.any(L.geq_mod(FR, evals))
    ys = bary_batch_kernel(n, roots_m, roots_m2, inv_n_m, evals, xs)
    return ys, ok


@partial(jax.jit, static_argnums=0)
def bary_batch_kernel(n: int, roots_m, roots_m2, inv_n_m, evals, xs):
    """Vectorized over the blob axis: evals [B, n, l] canonical, xs [B, l]
    canonical -> ys [B, l] canonical.  Same math as the single-blob kernel
    (reference: kzg.rs:346-389); callers guarantee every x is out of domain.

    Form bookkeeping (each trick saves one full-width multiply, and the
    full-width [B*n] muls are the measured cost floor of this kernel -
    SCALING.md "Device pipeline"):

    * evals stay CANONICAL: ``roots_m2`` carries w * R^2, so the two term
      multiplies land on ``(e * w / (x - w)) * R`` without a ``to_mont``
      over the [B, n] tensor;
    * the domain-axis sum is ONE raw column accumulation + ONE Montgomery
      reduction (:func:`limbs.sum_mont_redc`), whose R^-1 drops the sum to
      canonical form, absorbed by the tail constants.

    Value-identical output (the golden-diff suites pin it).
    """
    mul = lambda u, v: L.mont_mul(FR, u, v)
    x_m = L.to_mont(FR, xs)  # [B, l]
    d = L.sub_mod(
        FR, x_m[:, None, :], jnp.broadcast_to(roots_m, evals.shape)
    )
    inv = L.batch_mont_inv(FR, d, axis=1)
    # (1/(x-w))R x (w R^2) -> (w/(x-w)) R^2; x canonical e -> (e w/(x-w)) R
    terms = mul(mul(inv, roots_m2), evals)  # Montgomery form
    s = L.sum_mont_redc(FR, terms, axis=1)  # CANONICAL form sum
    s = mul(s, inv_n_m)  # canonical x mont -> canonical
    xn = L.mont_pow_const(FR, x_m, n)
    one_m = jnp.asarray(FR.one_mont)
    return mul(s, L.sub_mod(FR, xn, one_m))  # canonical result
