"""Fixed-base multi-scalar multiplication on device.

Replaces ``blst_p1s_mult_pippenger`` (reference: src/utils.rs:367-410, the
hot kernel of ``blob_to_kzg_commitment`` and ``compute_kzg_proof``; SURVEY.md
section 3.2) with a TPU-shaped algorithm.

Pippenger's bucket method is a poor fit for vector hardware: bucket
accumulation is a data-dependent scatter with a sequential carry of point
adds.  Because the KZG setup points are *fixed*, we instead precompute, per
point and per 4-bit scalar window, the odd multiples ``d * 2^(4j) * P_i``
(d = 1..8) once per trusted setup.  An MSM then becomes:

1. host: recode each 255-bit scalar into 64 signed base-16 digits in
   [-8, 8] (the top window absorbs the final carry since r < 2^255);
2. device: one gather from the table per (window, point) pair, a masked
   negation (Jacobian negation is free: -Y), and
3. device: a log-depth tree reduction of the 64*N selected points with the
   branch-free complete add from :mod:`kzg_rust_tpu.ops.curve` - every add
   full vector width, no scatter, no data-dependent control flow.

Total work: 64*N complete adds per mainnet MSM versus ~32*N + windows for
scalar Pippenger - a constant factor traded for a fully-vectorized,
compile-once program.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import curve as C
from . import limbs as L
from .fields import FP

WINDOW_BITS = 4
NUM_WINDOWS = 64  # ceil(255 / 4)
NUM_MULTIPLES = 8  # signed digits: |d| in 1..8


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
    Byte-matrix entry point so bulk callers (blob ingestion) skip the
    python-int round trip."""
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


@jax.jit
def recode_digits_from_limbs(limbs):
    """[n, NLIMBS_FR] canonical Fr limbs -> [64, n] int32 signed base-16
    digits, entirely on device (no host round trip between the quotient
    kernel and the MSM).  Same recoding as ``recode_signed_digits``: 12-bit
    limbs split into nibbles, then a 64-step carry scan; scalars are < r <
    2^255 so the top nibble is <= 7 and the final carry is absorbed.
    """
    l = limbs.astype(jnp.int32)
    nib = jnp.stack([l & 0xF, (l >> 4) & 0xF, (l >> 8) & 0xF], axis=-1)
    nib = nib.reshape(l.shape[:-1] + (3 * l.shape[-1],))[..., :NUM_WINDOWS]

    def step(carry, col):
        d = col + carry
        over = (d > 8).astype(jnp.int32)
        return over, d - 16 * over

    _, digits = lax.scan(
        step, jnp.zeros(l.shape[:-1], jnp.int32), jnp.moveaxis(nib, -1, 0)
    )
    return digits  # [64, ...batch]


def _msm_core(table, digits, fold: int):
    """table [64, 8, N, 3, l], digits [64, N] int32 -> one Jacobian point.

    Gather the digit-selected multiple per (window, point), mask zero digits
    to infinity, negate where the digit is negative, then tree-reduce.
    ``fold`` bounds the compiled program: the first reduction stage is a
    ``lax.scan`` over ``fold`` rows (one add in the body), the remainder an
    unrolled log-depth ladder.
    """
    nwin, _, n = table.shape[:3]
    pts = select_window_points(table, digits)
    flat = pts.reshape(nwin * n, 3, pts.shape[-1])
    return C.fold_reduce(flat, fold)


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


_msm_kernel = partial(jax.jit, static_argnums=2)(_msm_core)


class MsmContext:
    """Per-settings device state: the precomputed window table."""

    def __init__(self, n: int, table, fold: int):
        self.n = n
        self.table = table
        self.fold = fold

    @classmethod
    def build(cls, settings, fold: int | None = None) -> "MsmContext":
        return cls.build_from_points(settings.g1_values, fold)

    @classmethod
    def build_from_points(cls, points_affine, fold: int | None = None) -> "MsmContext":
        n = len(points_affine)
        if fold is None:
            total = NUM_WINDOWS * n
            fold = min(8192, 1 << (total.bit_length() - 1))
        points = C.points_to_jacobian(points_affine)
        table = _build_table_kernel(jnp.asarray(points))
        table = jax.block_until_ready(table)
        return cls(n, table, fold)


def msm_fixed_base(ctx: MsmContext, scalars):
    """MSM over the fixed setup points; returns a golden affine point/None.

    Matches ``g1_lincomb_fast`` semantics (reference: utils.rs:367-410):
    scalars are canonical Fr ints, result identical to the naive lincomb.
    """
    digits = recode_signed_digits(scalars, ctx.n)
    out = _msm_kernel(ctx.table, jnp.asarray(digits, dtype=jnp.int32), ctx.fold)
    return C.jacobian_to_points(np.asarray(out)[None])[0]
