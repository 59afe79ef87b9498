"""Pallas TPU kernels for the Montgomery hot path — MEASURED AND REJECTED.

Hand-scheduled VMEM-resident versions of the limb pipeline's hottest ops:

* ``mont_mul_pallas`` — one batched Montgomery multiply per grid tile;
* ``proj_add_pallas`` / ``proj_double_pallas`` — the complete RCB point
  formulas (ops/curve.py) fused into ONE kernel (12 resp. 8 Montgomery
  multiplies plus the modular adds/subs in a single tile residency).

The round-2 adopt-or-delete measurement (tools/bench_pallas.py, v5e,
differential chained timing, 2026-08): the plain XLA pipeline WINS —
proj_double 202 us vs 2335 us Pallas and proj_add 304 us vs 4220 us at
4096 rows (9-14x), mont_mul similarly.  Mosaic serializes the grid on the
single core and lowers the roll-heavy carry code worse than XLA's fused
pad-accumulate form, and the XLA path was already compute- (not HBM-)
bound.  Production therefore dispatches NO work here; the module is kept
as a correctness-tested (tests/test_ops_pallas.py) reference point for
future Mosaic revisions, and the measurement is recorded in SCALING.md
("Pallas decision").

All field constants (Toeplitz REDC matrices, modulus limbs, b3) are passed
as kernel INPUTS — Pallas rejects captured tracer constants.  Correctness
oracle: ops.limbs.mont_mul / ops.curve.proj_add (golden-verified).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L
from .fields import FP, FR

MASK = L.MASK
BASE_BITS = L.BASE_BITS


# ---------------------------------------------------------------------------
# In-kernel limb helpers (jnp ops on VMEM values; shifts are roll+mask so
# everything lowers to plain Mosaic vector ops - no pads, no concats)
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU-class backends and in
    interpreter mode elsewhere (CPU test meshes)."""
    return jax.default_backend() == "cpu"


def _shift_up(t, k: int):
    """Shift limbs toward higher significance by k (zero fill), in-kernel."""
    if k == 0:
        return t
    cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
    return jnp.where(cols >= k, pltpu.roll(t, shift=k, axis=t.ndim - 1), 0)


def _csave(t, passes: int = 2):
    for _ in range(passes):
        t = (t & MASK) + _shift_up(t >> BASE_BITS, 1)
    return t


def _ks_resolve(t):
    # Generate/propagate masks as uint32 0/1 (Mosaic cannot lane-rotate i1).
    n = t.shape[-1]
    g = (t >= (MASK + 1)).astype(jnp.uint32)
    p = (t == MASK).astype(jnp.uint32)
    shift = 1
    while shift < n:
        g = g | (p & _shift_up(g, shift))
        p = p & _shift_up(p, shift)
        shift *= 2
    carry_in = _shift_up(g, 1)
    return (t + carry_in) & MASK


def _raw_sub(x, y):
    n = x.shape[-1]
    t = x.astype(jnp.int32) - y.astype(jnp.int32)
    g = (t < 0).astype(jnp.uint32)
    p = (t == 0).astype(jnp.uint32)
    shift = 1
    while shift < n:
        g = g | (p & _shift_up(g, shift))
        p = p & _shift_up(p, shift)
        shift *= 2
    borrow_in = _shift_up(g, 1).astype(jnp.int32)
    diff = ((t - borrow_in) & MASK).astype(jnp.uint32)
    return diff, g[..., -1:]  # borrow kept 2D uint32


def _cond_sub_mod(x, mod_wide):
    """x in [0, 2N) [T, m] -> canonical; mod_wide [1, m] (modulus, padded)."""
    d, borrow = _raw_sub(x, mod_wide)
    return jnp.where(borrow != 0, x, d)


def _add_mod(a, b, mod_wide):
    s = _ks_resolve(a + b)
    return _cond_sub_mod(s, mod_wide)


def _sub_mod(a, b, mod_wide):
    d, borrow = _raw_sub(a, b)
    wrapped = _ks_resolve(d + mod_wide)
    return jnp.where(borrow != 0, wrapped, d)


def _mul_cols(a, b_wide, nout: int):
    """Column sums sum_i a[:, i] * b[:, k-i]: b enters zero-padded to nout
    lanes; each shifted term is a lane roll (zeros rotate in from the pad)."""
    n = a.shape[-1]
    total = a[:, 0:1] * b_wide
    for i in range(1, n):
        total = total + a[:, i : i + 1] * _shift_up(b_wide, i)
    return total


def _mul_cols_const(x, blo, bhi):
    """Constant-operand column sums on the MXU: x [T, nin] (digits
    <= 2^12 + 127), blo/bhi [nin, nout] int8 Toeplitz halves."""
    xi = x.astype(jnp.int32)
    x_lo = (xi & 0x7F).astype(jnp.int8)
    x_hi = (xi >> 7).astype(jnp.int8)

    def mm(u, v):
        return jax.lax.dot_general(
            u,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    out = (
        mm(x_lo, blo)
        + (mm(x_lo, bhi) << 6)
        + (mm(x_hi, blo) << 7)
        + (mm(x_hi, bhi) << 13)
    )
    return out.astype(jnp.uint32)


def _widen(x):
    """[T, n] -> [T, 2n] with zero high lanes (in-kernel)."""
    return jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)


def _mont_mul_tile(nlimbs, a, b_wide, np_lo, np_hi, mod_lo, mod_hi, mod_wide2):
    """One Montgomery product on VMEM tiles: a [T, n] canonical, b_wide
    [T, 2n] (operand b zero-padded high), constants as in ``_consts``.
    Returns [T, 2n] with the canonical result in the LOW n lanes (high
    lanes zero).  Same math/bounds as ops.limbs.mont_mul, VMEM-resident."""
    n = nlimbs
    tcols = _mul_cols(a, b_wide, 2 * n)  # [T, 2n] columns < 2^31
    cols = jax.lax.broadcasted_iota(jnp.int32, tcols.shape, 1)
    # Low-half digits, relaxed (carry out of lane n-1 lands in lane n and
    # is sliced away - identical mod b^n to limbs.py's slice-then-csave).
    tlo = _csave(tcols, 2)[:, :n]  # [T, n]
    m = _csave(_mul_cols_const(tlo, np_lo, np_hi), 2)  # [T, n]
    ucols = tcols + _mul_cols_const(_widen(m), mod_lo, mod_hi)  # [T, 2n]
    full = _ks_resolve(_csave(ucols, 2))  # low n lanes exactly zero
    # >> n limbs: a circular roll by n on the 2n-wide tile brings the high
    # half down; mask the wrapped-around (exactly-zero anyway) high lanes.
    shifted = jnp.where(cols < n, pltpu.roll(full, shift=n, axis=1), 0)
    return _cond_sub_mod(shifted, mod_wide2)


def _consts(spec):
    """Kernel-input constant pack for one field."""
    n = spec.nlimbs
    np_lo, np_hi = spec.nprime_mats  # [2n, n] support; slice to [n, n]
    mod_lo, mod_hi = spec.mod_mats  # [2n, 2n]
    mod_wide = np.zeros((1, 2 * n), np.uint32)
    mod_wide[0, :n] = spec.mod_limbs
    return (
        np.ascontiguousarray(np_lo[:n]),
        np.ascontiguousarray(np_hi[:n]),
        np.ascontiguousarray(mod_lo),
        np.ascontiguousarray(mod_hi),
        mod_wide,
    )


def _pad_wide(x, n):
    """[T, n] -> [T, 2n] zero-padded high lanes (outside the kernel)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n)])


# ---------------------------------------------------------------------------
# mont_mul
# ---------------------------------------------------------------------------


@functools.cache
def _make_mont_mul(spec, tile: int):
    n = spec.nlimbs

    def kernel(a_ref, b_ref, nplo_ref, nphi_ref, mlo_ref, mhi_ref, mw_ref, out_ref):
        out = _mont_mul_tile(
            n,
            a_ref[:],
            b_ref[:],
            nplo_ref[:],
            nphi_ref[:],
            mlo_ref[:],
            mhi_ref[:],
            mw_ref[:],
        )
        out_ref[:] = out[:, :n]

    consts = _consts(spec)

    @jax.jit
    def mont_mul_pallas(a, b):
        """Batched Montgomery product [N, n] x [N, n] -> [N, n]; N must be
        a multiple of ``tile`` (callers pad)."""
        n_rows = a.shape[0]
        grid = (pl.cdiv(n_rows, tile),)
        cspec = [
            pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
            for c in consts
        ]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, n), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 2 * n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ]
            + cspec,
            out_specs=pl.BlockSpec(
                (tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            interpret=_interpret(),
        )(a, _pad_wide(b, n), *[jnp.asarray(c) for c in consts])

    return mont_mul_pallas


def mont_mul_fp_pallas(a, b, tile: int = 512):
    return _make_mont_mul(FP, tile)(a, b)


def mont_mul_fr_pallas(a, b, tile: int = 512):
    return _make_mont_mul(FR, tile)(a, b)


# ---------------------------------------------------------------------------
# Fused complete point add / double (RCB algorithms 7 and 9, a = 0)
# ---------------------------------------------------------------------------


@functools.cache
def _make_proj_op(double: bool, tile: int):
    spec = FP
    n = spec.nlimbs
    consts = _consts(spec)
    b3 = np.zeros((1, 2 * n), np.uint32)
    b3[0, :n] = L.int_to_limbs(
        n, (12 * ((1 << (BASE_BITS * n)) % spec.modulus)) % spec.modulus
    )

    def kernel(p_ref, q_ref, nplo_ref, nphi_ref, mlo_ref, mhi_ref, mw_ref, b3_ref, out_ref):
        mw = mw_ref[:]
        cargs = (nplo_ref[:], nphi_ref[:], mlo_ref[:], mhi_ref[:], mw)
        widen = _widen

        def mul(u, v):  # wide x wide -> wide (low n live)
            return _mont_mul_tile(n, u[:, :n], v, *cargs)

        add = lambda u, v: _add_mod(u, v, mw)
        sub = lambda u, v: _sub_mod(u, v, mw)
        b3w = b3_ref[:]

        x1 = widen(p_ref[:, 0, :])
        y1 = widen(p_ref[:, 1, :])
        z1 = widen(p_ref[:, 2, :])
        if double:
            t0 = mul(y1, y1)
            z3 = add(add(add(t0, t0), add(t0, t0)), add(add(t0, t0), add(t0, t0)))
            t1 = mul(y1, z1)
            t2 = mul(b3w, mul(z1, z1))
            x3 = mul(t2, z3)
            y3 = add(t0, t2)
            z3 = mul(t1, z3)
            t1 = add(t2, t2)
            t2 = add(t1, t2)
            t0 = sub(t0, t2)
            y3 = add(x3, mul(t0, y3))
            x3 = mul(t0, mul(x1, y1))
            x3 = add(x3, x3)
        else:
            x2 = widen(q_ref[:, 0, :])
            y2 = widen(q_ref[:, 1, :])
            z2 = widen(q_ref[:, 2, :])
            t0 = mul(x1, x2)
            t1 = mul(y1, y2)
            t2 = mul(z1, z2)
            t3 = sub(mul(add(x1, y1), add(x2, y2)), add(t0, t1))
            t4 = sub(mul(add(y1, z1), add(y2, z2)), add(t1, t2))
            t5 = sub(mul(add(x1, z1), add(x2, z2)), add(t0, t2))
            three_t0 = add(add(t0, t0), t0)
            bt2 = mul(b3w, t2)
            z3t = add(t1, bt2)
            t1m = sub(t1, bt2)
            y3t = mul(b3w, t5)
            x3 = sub(mul(t3, t1m), mul(t4, y3t))
            y3 = add(mul(y3t, three_t0), mul(t1m, z3t))
            z3 = add(mul(z3t, t4), mul(three_t0, t3))
        out_ref[:, 0, :] = x3[:, :n]
        out_ref[:, 1, :] = y3[:, :n]
        out_ref[:, 2, :] = z3[:, :n]

    @jax.jit
    def proj_op(p, q):
        n_rows = p.shape[0]
        grid = (pl.cdiv(n_rows, tile),)
        cspec = [
            pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM)
            for c in consts
        ] + [pl.BlockSpec(b3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, 3, n), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ]
            + cspec,
            out_specs=pl.BlockSpec(
                (tile, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=_interpret(),
        )(p, q, *[jnp.asarray(c) for c in consts], jnp.asarray(b3))

    return proj_op


def proj_add_pallas(p, q, tile: int = 256):
    """Fused complete projective add [N, 3, l] x [N, 3, l] -> [N, 3, l];
    N must be a multiple of ``tile`` (callers pad)."""
    return _make_proj_op(False, tile)(p, q)


def proj_double_pallas(p, tile: int = 256):
    """Fused exception-free doubling [N, 3, l] -> [N, 3, l]."""
    return _make_proj_op(True, tile)(p, p)
