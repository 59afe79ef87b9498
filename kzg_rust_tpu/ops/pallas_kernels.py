"""Pallas TPU kernels for the Montgomery hot path.

The XLA limb pipeline (ops/limbs.py) already routes the two constant REDC
column sums onto the MXU and lets XLA fuse the rest; this module provides a
hand-scheduled Pallas alternative for the single most executed primitive -
the batched Montgomery multiply - keeping every intermediate column tensor
in VMEM for one grid tile instead of round-tripping fusion boundaries
through HBM.  ``bench_pallas_vs_xla`` (tools/bench_pallas.py) decides which
path wins on real hardware; the kernel is opt-in via
``KZG_TPU_PALLAS=1`` and falls back to the XLA path otherwise.

Correctness oracle: ``ops.limbs.mont_mul`` (itself tested against the pure
golden model).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L
from .fields import FP, FR


def _mont_mul_block(spec, a, b):
    """The column-parallel SOS/REDC body on in-register/VMEM values.

    Identical math to ops.limbs.mont_mul: T = a x b columns, quotient
    m = csave(T_lo) x N' mod R, U = T + m x N, normalize, >> n limbs,
    conditional subtract.  All operands are [T, nlimbs] uint32 tiles.
    """
    n = spec.nlimbs

    def mul_cols(x, y, nout):
        total = jnp.zeros(x.shape[:-1] + (nout,), jnp.uint32)
        for i in range(min(n, nout)):
            w = min(y.shape[-1], nout - i)
            prod = x[..., i : i + 1] * y[..., :w]
            pad = [(0, 0)] * (x.ndim - 1) + [(i, nout - i - w)]
            total = total + jnp.pad(prod, pad)
        return total

    def mul_cols_const(x, mats, nout):
        b_lo, b_hi = mats
        nin = x.shape[-1]
        xi = x.astype(jnp.int32)
        x_lo = (xi & 0x7F).astype(jnp.int8)
        x_hi = (xi >> 7).astype(jnp.int8)
        blo = jnp.asarray(b_lo[:nin])
        bhi = jnp.asarray(b_hi[:nin])

        def mm(u, v):
            return jax.lax.dot_general(
                u,
                v,
                dimension_numbers=(((u.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        out = (
            mm(x_lo, blo)
            + (mm(x_lo, bhi) << 6)
            + (mm(x_hi, blo) << 7)
            + (mm(x_hi, bhi) << 13)
        )
        return out.astype(jnp.uint32)

    tcols = mul_cols(a, b, 2 * n)
    tlo = L.csave(tcols[..., :n], 2)
    m = L.csave(mul_cols_const(tlo, spec.nprime_mats, n), 2)
    ucols = tcols + mul_cols_const(m, spec.mod_mats, 2 * n)
    full = L.normalize(ucols)
    return L.cond_sub_mod(spec, full[..., n :])


def _make_mont_mul(spec, tile: int):
    def kernel(a_ref, b_ref, out_ref):
        out_ref[:] = _mont_mul_block(spec, a_ref[:], b_ref[:])

    @jax.jit
    def mont_mul_pallas(a, b):
        n_rows = a.shape[0]
        grid = (pl.cdiv(n_rows, tile),)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, spec.nlimbs), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, spec.nlimbs), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, spec.nlimbs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile, spec.nlimbs), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(a, b)

    return mont_mul_pallas


# Batched [N, nlimbs] x [N, nlimbs] Montgomery multiplies, tiled over rows.
mont_mul_fp_pallas = _make_mont_mul(FP, 1024)
mont_mul_fr_pallas = _make_mont_mul(FR, 1024)
