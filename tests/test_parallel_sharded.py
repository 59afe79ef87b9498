"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest forces the CPU platform with xla_force_host_platform_device_count=8;
SURVEY.md section 4: test sharded paths without a pod).

Shapes are shared across tests (n=16 points, one mesh, one fold) because
every distinct shape costs a full XLA compile set on CPU.
"""

from __future__ import annotations

import random

import jax
import pytest

from kzg_rust_tpu.golden import curve as gc
from kzg_rust_tpu.golden.field import R
from kzg_rust_tpu.parallel import sharded as S

rng = random.Random(0xD15C)

N_POINTS = 16


@pytest.fixture(scope="module")
def sharded_ctx():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = S.default_mesh()
    pts = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, gc.R)) for _ in range(N_POINTS)]
    ctx = S.ShardedMsmContext.build_from_points(pts, mesh, fold=32)
    return ctx, pts


def test_sharded_msm_matches_naive(sharded_ctx):
    ctx, pts = sharded_ctx
    scalars = [rng.randrange(R) for _ in range(N_POINTS)]
    got = S.msm_fixed_base_sharded(ctx, scalars)
    assert got == gc.g1_lincomb_naive(pts, scalars)


def test_sharded_msm_matches_single_chip(sharded_ctx):
    from kzg_rust_tpu.ops import msm as M

    ctx, pts = sharded_ctx
    # fold=64 matches the MsmContext shapes in test_ops_msm.py.
    sc = M.MsmContext.build_from_points(pts, fold=64)
    scalars = [rng.randrange(R) for _ in range(N_POINTS)]
    assert S.msm_fixed_base_sharded(ctx, scalars) == M.msm_fixed_base(sc, scalars)


def test_sharded_barycentric_matches_golden():
    """Domain-axis sharded barycentric == golden scalar evaluation."""
    import jax.numpy as jnp
    import numpy as np

    from kzg_rust_tpu.backends.golden_backend import GoldenBackend
    from kzg_rust_tpu.ops import limbs as L
    from kzg_rust_tpu.ops.fields import FR
    from kzg_rust_tpu.presets import Preset
    from kzg_rust_tpu.settings import KzgSettings
    from kzg_rust_tpu.utils.domain import compute_roots_of_unity

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = S.domain_mesh()
    scale = 6  # 64-wide domain, divisible by the 8-device mesh
    n = 1 << scale
    roots = compute_roots_of_unity(scale)
    settings = KzgSettings(
        preset=Preset(name="t64", field_elements_per_blob=n),
        max_width=n,
        roots_of_unity=roots,
        g1_values=[],
        g2_values=[],
    )
    golden = GoldenBackend()
    b = 2
    evals = [[rng.randrange(R) for _ in range(n)] for _ in range(b)]
    xs = [rng.randrange(R) for _ in range(b)]

    rr = FR.mont_r
    roots_m = jnp.asarray(L.ints_to_limbs(FR.nlimbs, [(w * rr) % R for w in roots]))
    evals_arr = jnp.asarray(
        np.stack([L.ints_to_limbs(FR.nlimbs, e) for e in evals])
    )
    xs_arr = jnp.asarray(L.ints_to_limbs(FR.nlimbs, xs))
    got = L.limbs_to_ints(np.asarray(S.sharded_bary_kernel(roots_m, evals_arr, xs_arr, n, mesh)))
    want = [golden.barycentric_eval(settings, evals[i], xs[i]) for i in range(b)]
    assert got == want


def test_sharded_batch_core_matches_golden():
    """Blob-axis sharded RLC combination == golden naive lincombs
    (the scale-out path of verify_blob_kzg_proof_batch)."""
    import jax.numpy as jnp
    import numpy as np

    from kzg_rust_tpu.ops import curve as C
    from kzg_rust_tpu.ops import msm as M
    from kzg_rust_tpu.ops import verify_kernels as V

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = S.blobs_mesh()
    d = mesh.devices.size
    n = 2 * d
    commitments = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    proofs = [gc.g1_mul(gc.G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    r_powers = [rng.randrange(R) for _ in range(n)]
    r_times_z = [rng.randrange(R) for _ in range(n)]
    ys = [rng.randrange(R) for _ in range(n)]

    out = S.sharded_batch_core_kernel(
        jnp.asarray(C.points_to_proj(commitments)),
        jnp.asarray(C.points_to_proj(proofs)),
        V.build_generator_table(),
        n,
        mesh,
        jnp.asarray(V.scalars_to_bits(r_powers)),
        jnp.asarray(V.scalars_to_bits(r_times_z)),
        jnp.asarray(M.recode_signed_digits(ys, n), dtype=jnp.int32),
    )
    lhs, rhs = C.proj_to_points(np.asarray(out))

    assert lhs == gc.g1_lincomb_naive(proofs, r_powers)
    cmy = [
        gc.g1_sub(commitments[i], gc.g1_mul(gc.G1_GENERATOR, ys[i]))
        for i in range(n)
    ]
    assert rhs == gc.g1_add(
        gc.g1_lincomb_naive(cmy, r_powers), gc.g1_lincomb_naive(proofs, r_times_z)
    )
