"""Unit tests: the fused Pallas kernels against the XLA limb pipeline
(itself golden-verified).  On CPU test meshes the kernels run in Pallas
interpreter mode; on real TPU hardware (KZG_TPU_TEST_REAL_DEVICE=1) they
compile through Mosaic - the same assertions gate both.
"""

from __future__ import annotations

import random

import numpy as np
import jax.numpy as jnp

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.ops import curve as C
from kzg_rust_tpu.ops import limbs as L
from kzg_rust_tpu.ops import pallas_kernels as PK
from kzg_rust_tpu.ops.fields import FP, FR

rng = random.Random(0x9A11A5)
TILE = 8  # tiny tile so interpreter-mode grids stay fast


def test_mont_mul_pallas_matches_xla():
    for spec in (FP, FR):
        vals_a = [rng.randrange(spec.modulus) for _ in range(16)]
        vals_b = [rng.randrange(spec.modulus) for _ in range(16)]
        # Edge rows: 0*0, (N-1)^2, 1*x.
        vals_a[:3] = [0, spec.modulus - 1, 1]
        vals_b[:3] = [0, spec.modulus - 1, vals_b[2]]
        a = jnp.asarray(L.ints_to_limbs(spec.nlimbs, vals_a))
        b = jnp.asarray(L.ints_to_limbs(spec.nlimbs, vals_b))
        got = np.asarray(PK._make_mont_mul(spec, TILE)(a, b))
        want = np.asarray(L.mont_mul(spec, a, b))
        assert (got == want).all(), spec.name


def test_point_ops_pallas_match_xla():
    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(5)]
    # Exception lanes: P + P, P + (-P), inf + Q, P + inf.
    p_list = pts + [pts[0], pts[1], None]
    q_list = pts[:4] + [pts[0], (pts[1][0], (-pts[1][1]) % gc.P), pts[2], None]
    q_list = q_list[: len(p_list)]
    p = jnp.asarray(C.points_to_proj(p_list))
    q = jnp.asarray(C.points_to_proj(q_list))
    got = np.asarray(PK._make_proj_op(False, TILE)(p, q))
    want = np.asarray(C.proj_add(p, q))
    assert (got == want).all()
    got = np.asarray(PK._make_proj_op(True, TILE)(p, p))
    want = np.asarray(C.proj_double(p))
    assert (got == want).all()
