"""Batched device kernels for the verification paths.

The reference verifies batches with a per-blob host loop plus three naive
G1 lincombs and per-point subgroup checks (reference: src/kzg.rs:579-693,
src/utils.rs:282-342).  Here every per-blob / per-point quantity is one
batched, branch-free device program:

* subgroup membership for all parsed points in one scan-based kernel (the
  GLV check phi(P) == [-z^2]P, a 128-bit ladder instead of 255-bit [r]P);
* the three verification lincombs + per-blob generator multiples fused into
  a single jitted program that returns the two pairing inputs;
* barycentric evaluation vectorized over the blob axis.

Scalars enter as bit/digit matrices recoded on host with numpy (cheap,
byte-level); points enter as Jacobian Montgomery limb tensors.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..golden.field import P as _P
from . import curve as C
from . import limbs as L
from . import msm as M
from .fields import FP, FR

NBITS = 255

# GLV constants (see golden/curve.py g1_in_subgroup): beta a cube root of
# unity in Fp, z^2 the 128-bit eigenvalue magnitude.
_BETA_INT = pow(2, (_P - 1) // 3, _P)
_Z2 = 0xD201000000010000**2
_Z2_BITS = [int(b) for b in bin(_Z2)[2:]]  # MSB first, 128 bits


def scalars_to_bits(scalars, nbits: int = NBITS) -> np.ndarray:
    """List of ints -> [nbits, n] uint8 bit matrix, MSB first (row 0 is the
    top bit), ready for an MSB-first double-and-add scan."""
    n = len(scalars)
    nbytes = (nbits + 7) // 8
    buf = b"".join(int(s).to_bytes(nbytes, "big") for s in scalars)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(n, nbytes)
    bits = np.unpackbits(by, axis=1)[:, -nbits:]  # [n, nbits] MSB first
    return np.ascontiguousarray(bits.T)


def _dbl_add_ladder(points, bits):
    """MSB-first double-and-add: [..., n, 3, l] points, [nbits, n] bits ->
    per-point scalar multiples [n, 3, l].  One scan, two point-op shapes."""

    def step(acc, b):
        acc = C.jacobian_double(acc)
        added = C.jacobian_add(acc, points)
        return C.point_select(b != 0, added, acc), None

    init = C.jacobian_infinity((points.shape[0],))
    return lax.scan(step, init, bits)[0]


# ---------------------------------------------------------------------------
# Batched subgroup check
# ---------------------------------------------------------------------------


def _subgroup_check(points):
    """[n, 3, l] projective Montgomery points (already on-curve) -> bool [n].

    phi(P) == -[z^2]P with phi((X, Y, Z)) = (beta X, Y, Z); the comparison
    cross-multiplies so no inversion is needed.  Infinity passes (matching
    validate_kzg_g1, reference: utils.rs:298-301).
    """
    n = points.shape[0]
    beta_m = jnp.asarray(
        L.int_to_limbs(FP.nlimbs, (_BETA_INT * ((1 << (L.BASE_BITS * FP.nlimbs)) % _P)) % _P)
    )
    bits = jnp.asarray(np.array(_Z2_BITS, dtype=np.uint8))[:, None]
    bits = jnp.broadcast_to(bits, (len(_Z2_BITS), n))
    z2p = _dbl_add_ladder(points, bits)  # [z^2]P
    # phi(P): scale X by beta (Montgomery mul keeps Montgomery form).
    phix = L.mont_mul(FP, points[..., 0, :], beta_m)
    phiy = points[..., 1, :]
    phiz = points[..., 2, :]
    # Compare phi(P) == -z2p: projective (x = X/Z) equality via
    # cross-multiplication, no inversion.
    x2, y2, z2 = z2p[..., 0, :], L.neg_mod(FP, z2p[..., 1, :]), z2p[..., 2, :]
    eq_x = L.eq(L.mont_mul(FP, phix, z2), L.mont_mul(FP, x2, phiz))
    eq_y = L.eq(L.mont_mul(FP, phiy, z2), L.mont_mul(FP, y2, phiz))
    inf_a = L.is_zero(phiz)
    inf_b = L.is_zero(z2)
    both = eq_x & eq_y & ~inf_a & ~inf_b
    return both | (inf_a & inf_b)


subgroup_check_kernel = jax.jit(_subgroup_check)


@partial(jax.jit, static_argnums=0)
def batch_prepare_kernel(n: int, roots_m, inv_n_m, points, blob_bytes, xs):
    """Stage 1+2 of batch verification in ONE dispatch: subgroup-check all
    parsed points AND run the fused ingest+barycentric over all blobs.

    Returns a single packed [B+1, l] array (one fetch on the tunneled
    device): rows 0..B-1 are the ys, row B carries the two validity flags in
    its first limbs (limb 0 = all points in subgroup, limb 1 = all blob
    field elements canonical).
    """
    ok_sub = jnp.all(_subgroup_check(points))
    ys, ok_blob = bary_batch_from_bytes_kernel(n, roots_m, inv_n_m, blob_bytes, xs)
    flags = jnp.zeros((1, ys.shape[-1]), jnp.uint32)
    flags = flags.at[0, 0].set(ok_sub.astype(jnp.uint32))
    flags = flags.at[0, 1].set(ok_blob.astype(jnp.uint32))
    return jnp.concatenate([ys, flags], axis=0)


# ---------------------------------------------------------------------------
# Fused batch-verification core
# ---------------------------------------------------------------------------


def build_generator_table():
    """[64, 8, 1, 3, l] window table for the G1 generator (built once)."""
    from ..golden import curve as gc

    pts = C.points_to_jacobian([gc.G1_GENERATOR])
    return M._build_table_kernel(jnp.asarray(pts))


def batch_core(commitments, proofs, gen_table, n, r_bits, rz_bits, y_digits):
    """The whole RLC combination (reference: kzg.rs:601-621) in one program.

    Inputs: commitments/proofs [n, 3, l] Jacobian Montgomery; r_bits/rz_bits
    [255, n] bit matrices for the r-power and r*z scalars; y_digits [64, n]
    signed window digits of each y_i for the generator fixed-base multiply.
    Returns (proof_lincomb, rhs_g1), each [3, l]:
      proof_lincomb = sum r^i proof_i
      rhs_g1 = sum r^i (C_i - [y_i]G) + sum (r^i z_i) proof_i
    """
    # [y_i]G via the generator window table: gather digit-selected multiples
    # -> [64, n] points, reduce over the window axis.
    table = jnp.broadcast_to(
        gen_table, gen_table.shape[:2] + (n,) + gen_table.shape[3:]
    )  # [64, 8, n, 3, l]
    yg = M.select_window_points(table, y_digits)  # [64, n, 3, l]
    while yg.shape[0] > 1:
        half = yg.shape[0] // 2
        yg = C.jacobian_add(yg[:half], yg[half:])
    yg = yg[0]  # [n, 3, l] = [y_i]G

    c_minus_y = C.jacobian_add(commitments, C.point_neg(yg))

    # Two ladders over a fused width-2n batch (proofs appear with both
    # scalar sets), plus one for C - [y]G.
    pts2 = jnp.concatenate([proofs, proofs], axis=0)
    bits2 = jnp.concatenate([r_bits, rz_bits], axis=1)
    both = _dbl_add_ladder(pts2, bits2)  # [2n, 3, l]
    cmy = _dbl_add_ladder(c_minus_y, r_bits)  # [n, 3, l]

    proof_lincomb = C.fold_reduce(both[:n], _fold_for(n))
    proof_z_lincomb = C.fold_reduce(both[n:], _fold_for(n))
    cmy_lincomb = C.fold_reduce(cmy, _fold_for(n))
    rhs = C.jacobian_add(cmy_lincomb, proof_z_lincomb)
    return jnp.stack([proof_lincomb, rhs], axis=0)


batch_core_kernel = partial(jax.jit, static_argnums=3)(batch_core)


def _fold_for(n: int) -> int:
    f = 1
    while f * 2 <= n:
        f *= 2
    return max(2, min(f, 4096))


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
def bary_batch_from_bytes_kernel(n: int, roots_m, inv_n_m, blob_bytes, xs):
    """Fused ingest + canonicality check + batched barycentric evaluation:
    blob_bytes [B, n, 32] uint8 BE -> (ys [B, l], ok scalar bool).

    ``ok`` is False iff any field element is >= r (reference rejects such
    blobs, utils.rs:262-275); the ys are garbage in that case and callers
    must raise.  One dispatch, one fetch.
    """
    evals = blob_bytes_to_limbs(blob_bytes)
    ok = ~jnp.any(L.geq_mod(FR, evals))
    ys = bary_batch_kernel(n, roots_m, inv_n_m, evals, xs)
    return ys, ok


@partial(jax.jit, static_argnums=0)
def bary_batch_kernel(n: int, roots_m, inv_n_m, evals, xs):
    """Vectorized over the blob axis: evals [B, n, l] canonical, xs [B, l]
    canonical -> ys [B, l] canonical.  Same math as the single-blob kernel
    (reference: kzg.rs:346-389); callers guarantee every x is out of domain.
    """
    mul = lambda u, v: L.mont_mul(FR, u, v)
    e_m = L.to_mont(FR, evals)  # [B, n, l]
    x_m = L.to_mont(FR, xs)  # [B, l]
    d = L.sub_mod(FR, x_m[:, None, :], jnp.broadcast_to(roots_m, e_m.shape))
    inv = L.batch_mont_inv(FR, d, axis=1)
    terms = mul(mul(inv, roots_m), e_m)
    # log-depth tree sum over the domain axis (n is a power of two).
    t = terms
    while t.shape[1] > 1:
        half = t.shape[1] // 2
        t = L.add_mod(FR, t[:, :half], t[:, half:])
    s = mul(t[:, 0], inv_n_m)
    xn = L.mont_pow_const(FR, x_m, n)
    one_m = jnp.asarray(FR.one_mont)
    s = mul(s, L.sub_mod(FR, xn, one_m))
    return L.from_mont(FR, s)
