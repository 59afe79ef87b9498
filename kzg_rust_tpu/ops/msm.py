"""Fixed-base multi-scalar multiplication on device.

Replaces ``blst_p1s_mult_pippenger`` (reference: src/utils.rs:367-410, the
hot kernel of ``blob_to_kzg_commitment`` and ``compute_kzg_proof``; SURVEY.md
section 3.2) with a TPU-shaped algorithm.

Pippenger's bucket method is a poor fit for vector hardware: bucket
accumulation is a data-dependent scatter with a sequential carry of point
adds.  Because the KZG setup points are *fixed*, we instead precompute a
window table once per trusted setup and reduce every MSM to one gather plus
one wide masked tree-reduction — no scatter, no data-dependent control flow.

The production table is **GLV-halved and affine**: every 255-bit scalar k
splits as ``k = k1 + k2*lam (mod r)`` with ``|k1|, |k2| < 2^128``
(:mod:`kzg_rust_tpu.ops.glv`), and ``phi(P) = (beta*x, y) = [lam]P`` costs
one Fp multiply at gather time — so the table only covers 26 signed base-32
windows of a *128-bit* scalar instead of 64 base-16 windows of a 255-bit
one, and stores affine (X, Y) pairs so the hot accumulation runs the 11M
complete MIXED add:

1. scalars -> (k1, k2) -> signed base-32 digits in [-16, 16] (on host for
   int inputs, or entirely on device from Fr limbs via
   :func:`glv_digits_from_limbs` — the fused prover kernels never leave the
   chip);
2. one gather from the ``[26, 16, N, 2, l]`` table per (window, point,
   half), a masked negation (affine negation is free: -Y) and a beta-scaled
   X for the phi half;
3. a masked mixed-add fold (:func:`kzg_rust_tpu.ops.curve.fold_reduce_mixed`)
   of the ``52*N`` selected points — every add full vector width.

Versus the round-2 non-GLV projective table this halves the table HBM
(mainnet: 805 MB -> ~436 MB), cuts the gathered adds 64N -> 52N, and makes
each of them 11M instead of 12M.  The pre-GLV base-16 machinery is retained
below for the single-point generator table of the verification stage-2
kernel (:func:`kzg_rust_tpu.ops.verify_kernels.gen_mult`), where table size
is irrelevant.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import curve as C
from . import glv
from . import limbs as L
from .fields import FP, FR

WINDOW_BITS = 4
NUM_WINDOWS = 64  # ceil(255 / 4)
NUM_MULTIPLES = 8  # signed digits: |d| in 1..8

GLV_WINDOW_BITS = glv.WINDOW_BITS_32  # 5
GLV_NUM_WINDOWS = glv.NUM_WINDOWS_GLV32  # 26
GLV_NUM_MULTIPLES = 16  # signed base-32 digits: |d| in 1..16


# ---------------------------------------------------------------------------
# GLV affine window table
# ---------------------------------------------------------------------------


@jax.jit
def _build_glv_table_kernel(points):
    """[N, 3, nlimbs] projective Montgomery points -> (table, inf_mask).

    table [26, 16, N, 2, nlimbs]: AFFINE Montgomery (X, Y) of
    ``d * 32^j * P_i`` for d in 1..16; inf_mask [N] bool marks infinity
    input points (their table rows are garbage and must be masked at
    gather time — affine coordinates cannot encode infinity).

    Three compile-bounded stages: window bases ``32^j P`` via 5 doublings
    per scan step, multiples ``d*B`` via one add per scan step at full
    [26*N] width, then one batched Z inversion to normalize everything to
    affine (multiples of a non-infinity subgroup point are never infinity —
    d in 1..16 < r — so only the infinity input columns need the mask).
    """
    n = points.shape[0]
    nl = points.shape[-1]

    def base_step(b, _):
        nxt = b
        for _ in range(GLV_WINDOW_BITS):
            nxt = C.proj_double(nxt)
        return nxt, b

    _, bases = lax.scan(base_step, points, None, length=GLV_NUM_WINDOWS)
    flat = bases.reshape(GLV_NUM_WINDOWS * n, 3, nl)

    def mult_step(m, _):
        return C.proj_add(m, flat), m

    _, mults = lax.scan(mult_step, flat, None, length=GLV_NUM_MULTIPLES)
    # mults[d-1] = d * base; to [26, 16, N, 3, l]
    proj = mults.reshape(GLV_NUM_MULTIPLES, GLV_NUM_WINDOWS, n, 3, nl).transpose(
        1, 0, 2, 3, 4
    )
    inf_mask = C.point_is_inf(points)
    z = proj[..., 2, :]
    z_safe = jnp.where(
        L.is_zero(z)[..., None], jnp.asarray(FP.one_mont), z
    )  # zeros would poison the batched inversion
    zinv = L.batch_mont_inv(FP, z_safe.reshape(-1, nl), axis=0).reshape(z.shape)
    x = L.mont_mul(FP, proj[..., 0, :], zinv)
    y = L.mont_mul(FP, proj[..., 1, :], zinv)
    return jnp.stack([x, y], axis=-2), inf_mask


# ---------------------------------------------------------------------------
# On-device GLV decomposition + digit recoding (Fr limbs in, digits out)
# ---------------------------------------------------------------------------

_G1C_LIMBS = L.int_to_limbs(12, glv.G1C)  # ~2^135: 12 limbs
_Z2_LIMBS = L.int_to_limbs(11, glv.Z2)  # ~2^126: 11 limbs
_Z2M1_24 = L.int_to_limbs(24, glv.Z2 - 1)
_HALF_R_LIMBS = L.int_to_limbs(FR.nlimbs, glv.HALF_R_CEIL)
_MAG_LIMBS = 11  # |k1|, |k2| < 2^128 < 2^(12*11)


def _signed_sub(a, b):
    """Canonical limb tensors -> (|a - b| canonical, sign bool: a < b)."""
    d_ab, borrow = L.raw_sub(a, b)
    d_ba, _ = L.raw_sub(b, a)
    neg = borrow != 0
    return jnp.where(neg[..., None], d_ba, d_ab), neg


def glv_decompose_limbs(limbs):
    """Canonical Fr limbs [..., 22] -> (mag1, neg1, mag2, neg2): the GLV
    halves ``k = k1 + k2*lam (mod r)`` as magnitude limb tensors
    [..., 11] (< 2^128) plus sign flags — the device mirror of
    :func:`kzg_rust_tpu.ops.glv.decompose`, with the Babai roundings
    replaced by one floor-based multiply-high (constants and the resulting
    bound documented in glv.py)."""
    n_k = limbs.shape[-1]
    # m1 = floor(k * G1C / 2^264): drop the low 22 limbs of the product.
    cols = L._mul_cols(limbs, jnp.asarray(_G1C_LIMBS), 35)
    prod = L.carry_canonical(cols, 35)
    m1 = prod[..., FR.nlimbs : FR.nlimbs + 12]  # [..., 12]
    # m2' = round(k / r) in {0, 1}: k >= ceil(r/2).
    m2p = L.geq_const(FR, limbs, _HALF_R_LIMBS)  # bool [...]

    # u = m1 * z^2 + m2'; k1 = k - u (signed).
    t1c = L._mul_cols(m1, jnp.asarray(_Z2_LIMBS), 24)
    t1c = t1c.at[..., 0].add(m2p.astype(jnp.uint32))
    u = L.carry_canonical(t1c, 24)
    pad = jnp.zeros(limbs.shape[:-1] + (24 - n_k,), limbs.dtype)
    k_pad = jnp.concatenate([limbs, pad], axis=-1)
    k1, neg1 = _signed_sub(k_pad, u)

    # v = m2' * (z^2 - 1); k2 = v - m1 (signed).
    v = jnp.where(m2p[..., None], jnp.asarray(_Z2M1_24), jnp.zeros((24,), jnp.uint32))
    m1_pad = jnp.concatenate(
        [m1, jnp.zeros(m1.shape[:-1] + (12,), m1.dtype)], axis=-1
    )
    k2, neg2 = _signed_sub(v, m1_pad)
    return k1[..., :_MAG_LIMBS], neg1, k2[..., :_MAG_LIMBS], neg2


def _digits_base32(mag, neg):
    """Magnitude limbs [..., 11] (< 2^130) + sign -> [26, ...] int32 signed
    base-32 digits in [-16, 16] (exact: sum d_j 32^j == +-mag).  One 26-step
    scan; each step extracts 5 bits and resolves the signed-recoding carry.
    """

    def shr5(m):
        hi = jnp.concatenate([m[..., 1:], jnp.zeros_like(m[..., :1])], axis=-1)
        return ((m >> 5) | ((hi & 31) << 7)) & L.MASK

    def step(carry, _):
        m, c = carry
        d = (m[..., 0] & 31).astype(jnp.int32) + c
        over = (d > 16).astype(jnp.int32)
        return (shr5(m), over), d - 32 * over

    init = (mag, jnp.zeros(mag.shape[:-1], jnp.int32))
    _, digs = lax.scan(step, init, None, length=GLV_NUM_WINDOWS)
    sign = jnp.where(neg, -1, 1).astype(jnp.int32)
    return digs * sign[None]


@jax.jit
def glv_digits_from_limbs(limbs):
    """[..., NLIMBS_FR] canonical Fr limbs -> (d1, d2), each
    [26, ...] int32 signed base-32 digits — the full scalar recoding of the
    GLV fixed-base MSM, entirely on device (no host round trip between the
    quotient kernel and the MSM)."""
    mag1, neg1, mag2, neg2 = glv_decompose_limbs(limbs)
    return _digits_base32(mag1, neg1), _digits_base32(mag2, neg2)


# ---------------------------------------------------------------------------
# GLV MSM core
# ---------------------------------------------------------------------------


def _msm_core_glv(table, inf_mask, d1, d2, fold: int, aff_levels: int = 0):
    """table [26, 16, N, 2, l] affine + inf_mask [N], digits [26, N] int32
    -> one projective Montgomery point [3, l].

    Gather the digit-selected multiple per (window, point) for both GLV
    halves (the phi half scales X by beta — phi commutes with doubling and
    negation, so twisting the table entry is exact), then one masked
    mixed-add fold over all 52*N selections.  ``aff_levels`` pre-reduces
    with Montgomery-batched affine tree levels first (see
    :func:`kzg_rust_tpu.ops.curve.fold_reduce_mixed`).
    """
    n = table.shape[2]
    nl = table.shape[-1]
    beta = jnp.asarray(C.BETA_MONT)

    # Digit-select as a one-hot masked REDUCTION over the 16-multiple axis,
    # not a take_along_axis: the XLA gather lowers to near-scalar row loads
    # (~16 ms at mainnet width, measured — tools/probe_msm.py) while the
    # masked reduction is one fused streaming pass over the table (~1 ms at
    # the same width; it reads 16x the bytes and is still ~15x faster).
    ar = jnp.arange(1, GLV_NUM_MULTIPLES + 1, dtype=jnp.int32)

    def gather(digits, phi: bool):
        mag = jnp.abs(digits)  # [26, N]
        onehot = (mag[:, None, :] == ar[None, :, None]).astype(jnp.uint32)
        sel = jnp.sum(table * onehot[..., None, None], axis=1)  # [26, N, 2, l]
        x = sel[..., 0, :]
        if phi:
            x = L.mont_mul(FP, x, beta)
        y = jnp.where(
            (digits < 0)[..., None], L.neg_mod(FP, sel[..., 1, :]), sel[..., 1, :]
        )
        pts = jnp.stack([x, y], axis=-2)  # [26, N, 2, l]
        valid = (mag != 0) & ~inf_mask[None, :]
        return pts, valid

    p1, v1 = gather(d1, False)
    p2, v2 = gather(d2, True)
    pts = jnp.stack([p1, p2], axis=0).reshape(2 * GLV_NUM_WINDOWS * n, 2, nl)
    valid = jnp.stack([v1, v2], axis=0).reshape(-1)
    return C.fold_reduce_mixed(pts, valid, fold, aff_levels)


_msm_glv_kernel = partial(jax.jit, static_argnums=(4, 5))(_msm_core_glv)


class MsmContext:
    """Per-settings device state: the precomputed GLV window table."""

    def __init__(self, n: int, table, inf_mask, fold: int):
        self.n = n
        self.table = table
        self.inf_mask = inf_mask
        self.fold = fold

    @classmethod
    def build(cls, settings, fold: int | None = None) -> "MsmContext":
        return cls.build_from_points(settings.g1_values, fold)

    @classmethod
    def build_from_points(cls, points_affine, fold: int | None = None) -> "MsmContext":
        n = len(points_affine)
        if fold is None:
            total = 2 * GLV_NUM_WINDOWS * n
            fold = min(8192, 1 << (total.bit_length() - 1))
        points = C.points_to_jacobian(points_affine)
        table, inf_mask = _build_glv_table_kernel(jnp.asarray(points))
        table = jax.block_until_ready(table)
        return cls(n, table, inf_mask, fold)


def recode_glv_host(scalars) -> tuple[np.ndarray, np.ndarray]:
    """Canonical Fr ints -> (d1, d2) int8 [26, n] signed base-32 digit
    matrices (host-side GLV split + recode, for callers with int scalars)."""
    k1s, k2s = glv.decompose_batch(scalars)
    return glv.recode_base32_signed(k1s), glv.recode_base32_signed(k2s)


def msm_fixed_base(ctx: MsmContext, scalars):
    """MSM over the fixed setup points; returns a golden affine point/None.

    Matches ``g1_lincomb_fast`` semantics (reference: utils.rs:367-410):
    scalars are canonical Fr ints, result identical to the naive lincomb.
    """
    d1, d2 = recode_glv_host(scalars)
    out = _msm_glv_kernel(
        ctx.table,
        ctx.inf_mask,
        jnp.asarray(d1, dtype=jnp.int32),
        jnp.asarray(d2, dtype=jnp.int32),
        ctx.fold,
    )
    return C.proj_to_points(np.asarray(out)[None])[0]


# ---------------------------------------------------------------------------
# Pre-GLV base-16 projective machinery (generator table only)
# ---------------------------------------------------------------------------


@jax.jit
def _build_table_kernel(points):
    """[N, 3, nlimbs] Jacobian points -> [64, 8, N, 3, nlimbs] table of
    d * 2^(4j) * P_i for d in 1..8.

    Two scans, each with a single point-op body shape (compile-bounded):
    window bases 2^(4j)P via 4 doublings per step, then the multiples
    d*B via one add per step at full [64*N] width.
    """

    def base_step(b, _):
        nxt = b
        for _ in range(WINDOW_BITS):
            nxt = C.jacobian_double(nxt)
        return nxt, b

    _, bases = lax.scan(base_step, points, None, length=NUM_WINDOWS)
    flat = bases.reshape(NUM_WINDOWS * points.shape[0], 3, points.shape[-1])

    def mult_step(m, _):
        return C.jacobian_add(m, flat), m

    _, mults = lax.scan(mult_step, flat, None, length=NUM_MULTIPLES)
    # mults[d-1] = d * base; reshape to [64, 8, N, 3, l]
    return mults.reshape(
        NUM_MULTIPLES, NUM_WINDOWS, points.shape[0], 3, points.shape[-1]
    ).transpose(1, 0, 2, 3, 4)


def recode_signed_digits(scalars, n: int) -> np.ndarray:
    """List of ints (mod r) -> [64, n] int8 signed base-16 digits.

    Standard signed-window recoding: nibble + carry, values > 8 borrow from
    the next window.  Scalars are < r < 2^255, so the top nibble is <= 7 and
    the final carry is absorbed (top digit <= 8), never emitted.
    """
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(n, 32)
    return recode_signed_digits_le_bytes(by)


def recode_signed_digits_le_bytes(by: np.ndarray) -> np.ndarray:
    """[n, 32] little-endian scalar bytes -> [64, n] int8 signed digits.
    Byte-matrix entry point so bulk callers skip the python-int round trip."""
    n = by.shape[0]
    nib = np.zeros((n, NUM_WINDOWS), dtype=np.int16)
    nib[:, 0::2] = by & 0xF
    nib[:, 1::2] = by >> 4
    digits = np.zeros((n, NUM_WINDOWS), dtype=np.int8)
    carry = np.zeros(n, dtype=np.int16)
    for j in range(NUM_WINDOWS):
        d = nib[:, j] + carry
        over = (d > 8).astype(np.int16)
        carry = over
        digits[:, j] = (d - 16 * over).astype(np.int8)
    assert not carry.any(), "scalar exceeded 255 bits"
    return np.ascontiguousarray(digits.T)  # [64, n]


def select_window_points(table, digits):
    """Gather the digit-selected multiple per (window, point) from a
    ``[W, 8, N, 3, l]`` table: digit 0 -> projective infinity (0, Y, 0 -
    both X and Z must be zeroed for the complete-add formulas; table Y is
    never zero), negative digit -> negated Y.  Returns [W, N, 3, l]."""
    mag = jnp.abs(digits)  # [W, N]
    idx = jnp.maximum(mag - 1, 0)[:, None, :, None, None]
    sel = jnp.take_along_axis(table, idx.astype(jnp.int32), axis=1)[:, 0]
    zmask = (mag == 0)[..., None]
    x = jnp.where(zmask, jnp.zeros_like(sel[..., 0, :]), sel[..., 0, :])
    z = jnp.where(zmask, jnp.zeros_like(sel[..., 2, :]), sel[..., 2, :])
    y = jnp.where((digits < 0)[..., None], L.neg_mod(FP, sel[..., 1, :]), sel[..., 1, :])
    return jnp.stack([x, y, z], axis=-2)
