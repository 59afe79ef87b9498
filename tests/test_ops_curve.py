"""Unit tests: branch-free device G1 arithmetic vs the golden model.

Covers every masked edge case of the complete add (generic, doubling,
inverse pair, infinity operands) that the reference leaves to blst's
internal branching (reference: utils.rs:126-183).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.ops import curve as dc

rng = random.Random(0xC0FFEE)


def rand_points(k):
    return [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(k)]


def test_codec_roundtrip():
    pts = rand_points(5) + [None, gc.G1_GENERATOR]
    arr = dc.points_to_jacobian(pts)
    assert dc.jacobian_to_points(arr) == pts


def test_add_generic_and_edges():
    ps = rand_points(6)
    qs = rand_points(6)
    # Edge cases: doubling, inverse pair, infinity left/right/both, generic.
    pairs = list(zip(ps, qs)) + [
        (ps[0], ps[0]),
        (ps[1], gc.g1_neg(ps[1])),
        (None, qs[2]),
        (ps[3], None),
        (None, None),
    ]
    a = dc.points_to_jacobian([p for p, _ in pairs])
    b = dc.points_to_jacobian([q for _, q in pairs])
    got = dc.jacobian_to_points(dc.jacobian_add(a, b))
    want = [gc.g1_add(p, q) for p, q in pairs]
    assert got == want


def test_double():
    pts = rand_points(4) + [None]
    arr = dc.points_to_jacobian(pts)
    got = dc.jacobian_to_points(dc.jacobian_double(arr))
    assert got == [gc.g1_add(p, p) for p in pts]


def test_neg():
    pts = rand_points(3) + [None]
    arr = dc.points_to_jacobian(pts)
    assert dc.jacobian_to_points(dc.point_neg(arr)) == [gc.g1_neg(p) for p in pts]


@pytest.mark.parametrize("n,scan_rows", [(1, 0), (7, 0), (64, 8), (33, 0)])
def test_tree_reduce(n, scan_rows):
    pts = rand_points(n - 1) + [None]
    arr = dc.points_to_jacobian(pts)
    got = dc.jacobian_to_points(dc.tree_reduce(arr, scan_rows=scan_rows)[None])[0]
    want = None
    for p in pts:
        want = gc.g1_add(want, p)
    assert got == want


def test_chained_adds_match_scalar_mul():
    # 2^k P via repeated doubling equals golden scalar mul.
    p = rand_points(1)[0]
    arr = dc.points_to_jacobian([p])
    for _ in range(10):
        arr = dc.jacobian_double(arr)
    got = dc.jacobian_to_points(arr)[0]
    assert got == gc.g1_mul(p, 1 << 10)


def test_affine_tree_levels_vs_mixed_fold():
    """Batched-affine pre-reduction (VERDICT round-4 item 3) == the plain
    mixed fold on every special case: duplicate points (tangent path),
    P + (-P) (infinity), invalid lanes in both slots, and ordinary chords.
    """
    import jax.numpy as jnp
    import numpy as np

    from kzg_rust_tpu.golden import curve as gc
    from kzg_rust_tpu.ops import curve as C
    from kzg_rust_tpu.ops import limbs as L
    from kzg_rust_tpu.ops.fields import FP

    rng = random.Random(0xAFF1)
    rr = FP.mont_r

    def aff(p):
        out = np.zeros((2, FP.nlimbs), np.uint32)
        if p is not None:
            out[0] = L.int_to_limbs(FP.nlimbs, (p[0] * rr) % gc.P)
            out[1] = L.int_to_limbs(FP.nlimbs, (p[1] * rr) % gc.P)
        return out

    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(10)]
    entries = [
        (pts[0], True), (pts[1], True),            # chord
        (pts[2], True), (pts[2], True),            # duplicate -> tangent
        (pts[3], True), (gc.g1_neg(pts[3]), True), # P + (-P) -> infinity
        (None, False), (pts[4], True),             # invalid left
        (pts[5], True), (None, False),             # invalid right
        (None, False), (None, False),              # both invalid
        (pts[6], True), (pts[7], True),
        (pts[8], True), (pts[9], True),
    ]
    arr = jnp.asarray(np.stack([aff(p) for p, _ in entries]))
    valid = jnp.asarray(np.array([v for _, v in entries]))

    want = C.proj_to_points(
        np.asarray(C.fold_reduce_mixed(arr, valid, 4))[None]
    )[0]
    for k in (1, 2):
        got = C.proj_to_points(
            np.asarray(C.fold_reduce_mixed(arr, valid, 4, aff_levels=k))[None]
        )[0]
        assert got == want, k
    # golden cross-check of the whole sum
    gsum = None
    for p, v in entries:
        if v:
            gsum = gc.g1_add(gsum, p) if gsum is not None else p
    assert want == gsum
