"""Multi-chip scale-out: sharded MSM over a device mesh.

The reference is single-threaded host code (SURVEY.md section 2.4: no
parallelism anywhere; the one acknowledgment is the comment at reference
kzg.rs:661).  This module is the TPU-native scale-out design that replaces
nothing-in-the-reference but is required by the BASELINE.json configs: the
trusted-setup point axis is sharded across chips, each chip computes the
partial sum of its point shard with the same gather + fold-reduce kernel as
the single-chip path, and the per-chip Jacobian partials are combined with an
``all_gather`` over ICI followed by a tiny on-chip reduction.  Point sums
are associative, so any reduction order yields the same group element
(byte-exact output after affine normalization).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve as C
from ..ops import msm as M

POINTS_AXIS = "points"


def _mesh(axis: str, n_devices: int | None = None) -> Mesh:
    """A 1-D mesh of the first n_devices visible devices over ``axis``."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def default_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the point axis (MSM 'tensor parallelism')."""
    return _mesh(POINTS_AXIS, n_devices)


class ShardedMsmContext:
    """GLV MSM context whose affine window table is sharded over the point
    axis (table layout: :func:`kzg_rust_tpu.ops.msm._build_glv_table_kernel`)."""

    def __init__(self, n: int, table, inf_mask, fold: int, mesh: Mesh):
        self.n = n
        self.mesh = mesh
        self.fold = fold
        self.table = table
        self.inf_mask = inf_mask
        self.n_shards = mesh.devices.size

    @classmethod
    def build_from_points(
        cls, points_affine, mesh: Mesh, fold: int | None = None
    ) -> "ShardedMsmContext":
        n = len(points_affine)
        d = mesh.devices.size
        if n % d != 0:
            raise ValueError(f"point count {n} not divisible by mesh size {d}")
        if fold is None:
            local_total = 2 * M.GLV_NUM_WINDOWS * (n // d)
            fold = min(8192, 1 << (local_total.bit_length() - 1))
        points = C.points_to_jacobian(points_affine)
        # Shard the input points first and build the window table under a
        # sharded out-sharding: the build is pointwise along the point axis,
        # so each chip materializes only its table shard (peak HBM ~ 1/D of
        # the full table) instead of building everything on device 0 and
        # resharding after.
        psharding = NamedSharding(mesh, P(POINTS_AXIS, None, None))
        pts_dev = jax.device_put(jnp.asarray(points), psharding)
        tsharding = NamedSharding(mesh, P(None, None, POINTS_AXIS, None, None))
        isharding = NamedSharding(mesh, P(POINTS_AXIS))
        table, inf_mask = jax.jit(
            M._build_glv_table_kernel, out_shardings=(tsharding, isharding)
        )(pts_dev)
        return cls(n, jax.block_until_ready(table), inf_mask, fold, mesh)

    @classmethod
    def build(cls, settings, mesh: Mesh, fold: int | None = None):
        return cls.build_from_points(settings.g1_values, mesh, fold)


@partial(jax.jit, static_argnums=(4, 5))
def _sharded_msm_kernel(table, inf_mask, d1, d2, fold: int, mesh: Mesh):
    """shard_map over the point axis: local gather + mixed-add fold per
    chip, all_gather of the [3, nlimbs] partials, small replicated
    reduction."""
    from ._compat import shard_map

    def local(table_shard, inf_shard, d1_shard, d2_shard):
        partial_pt = M._msm_core_glv(table_shard, inf_shard, d1_shard, d2_shard, fold)
        gathered = jax.lax.all_gather(partial_pt, POINTS_AXIS)  # [D, 3, l]
        # tree_reduce, not fold_reduce: mesh sizes need not be powers of two
        return C.tree_reduce(gathered)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, POINTS_AXIS, None, None),
            P(POINTS_AXIS),
            P(None, POINTS_AXIS),
            P(None, POINTS_AXIS),
        ),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(table, inf_mask, d1, d2)


def msm_fixed_base_sharded(ctx: ShardedMsmContext, scalars):
    """Sharded fixed-base MSM; same group element as the 1-chip path (the
    per-shard fold + cross-device tree reduce changes the reduction order,
    so raw projective limbs may differ by a Z-scale; the decoded affine
    point is identical, which is what callers and tests compare)."""
    d1, d2 = M.recode_glv_host(scalars)
    dig_sharding = NamedSharding(ctx.mesh, P(None, POINTS_AXIS))
    d1 = jax.device_put(jnp.asarray(d1, dtype=jnp.int32), dig_sharding)
    d2 = jax.device_put(jnp.asarray(d2, dtype=jnp.int32), dig_sharding)
    out = _sharded_msm_kernel(ctx.table, ctx.inf_mask, d1, d2, ctx.fold, ctx.mesh)
    return C.jacobian_to_points(np.asarray(out)[None])[0]


@partial(jax.jit, static_argnums=(3, 4))
def sharded_commit_kernel(table, inf_mask, blob_bytes, fold: int, mesh: Mesh):
    """Point-sharded fused ``blob_to_kzg_commitment``: each device ingests
    its shard of the blob (the Lagrange-basis scalar i multiplies setup
    point i, so the blob's field-element axis IS the point axis), checks
    canonicality, GLV-decomposes + recodes its own scalars, and runs the
    local gather + mixed-add fold; the [3, l] partials combine with one
    all_gather + tree reduce and the canonicality flags AND-combine the same
    way.  Output: (commitment [3, l] canonical non-Montgomery projective,
    ok scalar) — the same group element as the single-device
    :func:`kzg_rust_tpu.ops.prover_kernels.commit_kernel` (projective limbs
    may differ by a Z-scale from the reduction order; the decoded affine
    point is identical).
    """
    from ._compat import shard_map

    from ..ops import limbs as L
    from ..ops.fields import FP, FR
    from ..ops.verify_kernels import blob_bytes_to_limbs

    def local(t, im, bb):
        evals = blob_bytes_to_limbs(bb)
        ok = ~jnp.any(L.geq_mod(FR, evals))
        d1, d2 = M.glv_digits_from_limbs(evals)
        part = M._msm_core_glv(t, im, d1, d2, fold)
        gathered = jax.lax.all_gather(part, POINTS_AXIS)
        oks = jax.lax.all_gather(ok, POINTS_AXIS)
        out = C.tree_reduce(gathered)
        return L.from_mont(FP, out), jnp.all(oks)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, POINTS_AXIS, None, None),
            P(POINTS_AXIS),
            P(POINTS_AXIS, None),
        ),
        out_specs=(P(None, None), P()),
        check_rep=False,
    )
    return fn(table, inf_mask, blob_bytes)


# ---------------------------------------------------------------------------
# Domain-axis sharded barycentric evaluation (sequence-parallel analog)
# ---------------------------------------------------------------------------

DOMAIN_AXIS = "domain"


def domain_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the FIELD_ELEMENTS_PER_BLOB evaluation-domain axis
    (SURVEY.md section 5 long-context analog: the reference's 4096-element
    loops, kzg.rs:353-378, sharded instead of sequential)."""
    return _mesh(DOMAIN_AXIS, n_devices)


@partial(jax.jit, static_argnums=(3, 4))
def sharded_bary_kernel(roots_m, evals, xs, n: int, mesh: Mesh):
    """Barycentric evaluation with the domain axis sharded across devices.

    Each device computes its local partial sum of ``e_i * w_i / (x - w_i)``
    (with a per-shard batched inversion), the Fr partials are all_gathered
    and tree-reduced with modular adds, and the replicated tail applies the
    ``(x^n - 1)/n`` scaling.  evals [B, n, l], xs [B, l] canonical; ys
    [B, l] canonical, bit-identical to the single-chip kernel.
    """
    from ._compat import shard_map

    from ..ops import limbs as L
    from ..ops import protocol_kernels as PK
    from ..ops.fields import FR

    inv_n_m = jnp.asarray(
        L.int_to_limbs(
            FR.nlimbs, (pow(n, -1, FR.modulus) * FR.mont_r) % FR.modulus
        )
    )

    def local(roots_sh, evals_sh, x):
        mul = lambda u, v: L.mont_mul(FR, u, v)
        e_m = L.to_mont(FR, evals_sh)  # [B, n/D, l]
        x_m = L.to_mont(FR, x)  # [B, l]
        d = L.sub_mod(FR, x_m[:, None, :], jnp.broadcast_to(roots_sh, e_m.shape))
        inv = L.batch_mont_inv(FR, d, axis=1)
        terms = mul(mul(inv, roots_sh), e_m)  # Montgomery form
        # Local partial: one raw column sum + one Montgomery reduction
        # (drops out of Montgomery form; see limbs.sum_mont_redc).
        part = L.sum_mont_redc(FR, terms, axis=1)  # [B, l] canonical
        parts = jax.lax.all_gather(part, DOMAIN_AXIS)  # [D, B, l]
        s = parts
        while s.shape[0] > 1:
            half = s.shape[0] // 2
            s = L.add_mod(FR, s[:half], s[half:])
        s = mul(s[0], inv_n_m)  # canonical x mont -> canonical
        xn = L.mont_pow_const(FR, x_m, n)
        one_m = jnp.asarray(FR.one_mont)
        return mul(s, L.sub_mod(FR, xn, one_m))  # canonical result

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DOMAIN_AXIS, None), P(None, DOMAIN_AXIS, None), P(None, None)),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(roots_m, evals, xs)


# ---------------------------------------------------------------------------
# Blob-axis sharded batch verification (BASELINE configs 4-5)
# ---------------------------------------------------------------------------

BLOBS_AXIS = "blobs"


def blobs_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the blob axis (batch-verification data parallelism).

    The reference's batch loop is sequential host code (reference:
    kzg.rs:671-683, "Potentially paralellizable"); here each device handles
    a blob shard and the RLC partial sums ride one all_gather over ICI.
    """
    return _mesh(BLOBS_AXIS, n_devices)


@partial(jax.jit, static_argnums=1)
def sharded_batch_points_kernel(comp_bytes, mesh: Mesh):
    """Blob-axis sharded stage 1 of batch verification (decompress + window
    chain + GLV subgroup check, :func:`ops.verify_kernels.batch_points`).

    ``comp_bytes`` is the [2B, 48] blob-major compressed-point matrix; each
    device decompresses and chains its own blobs' points with ZERO
    communication (the chain is pointwise along the point axis), then the
    two validity flags are AND-combined with one tiny all_gather.  Returns
    (bases, bases2, flags) with the bases left sharded over the point axis,
    exactly where stage 2 needs them.
    """
    from ._compat import shard_map

    from ..ops import verify_kernels as V

    def local(comp_shard):
        bases, bases2, flags = V.batch_points(comp_shard)
        gathered = jax.lax.all_gather(flags, BLOBS_AXIS)  # [D, 2]
        return bases, bases2, jnp.min(gathered, axis=0)  # AND of the flags

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOBS_AXIS, None),),
        out_specs=(
            P(None, BLOBS_AXIS, None, None),
            P(None, BLOBS_AXIS, None, None),
            P(None),
        ),
        check_rep=False,
    )
    return fn(comp_bytes)


@partial(jax.jit, static_argnums=(0, 6))
def sharded_bary_blobs_kernel(n: int, roots_m, roots_m2, inv_n_m, blob_bytes, xs, mesh: Mesh):
    """Blob-axis sharded fused ingest + canonicality + barycentric
    (:func:`ops.verify_kernels.bary_batch_from_bytes_kernel`): each device
    evaluates its own blob shard (no communication), the canonicality flags
    are AND-combined with one tiny all_gather.  Returns (ys [B, l] sharded
    over blobs, ok scalar)."""
    from ._compat import shard_map

    from ..ops import verify_kernels as V

    def local(blob_shard, xs_shard):
        ys, ok = V.bary_batch_from_bytes_kernel(
            n, roots_m, roots_m2, inv_n_m, blob_shard, xs_shard
        )
        gathered = jax.lax.all_gather(ok, BLOBS_AXIS)  # [D]
        return ys, jnp.all(gathered)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOBS_AXIS, None, None), P(BLOBS_AXIS, None)),
        out_specs=(P(BLOBS_AXIS, None), P()),
        check_rep=False,
    )
    return fn(blob_bytes, xs)


@partial(jax.jit, static_argnums=5)
def sharded_batch_stage2_kernel(bases, bases2, digits, gen_table, sy_digits, mesh: Mesh):
    """Blob-axis sharded stage 2 (the RLC combination, reference
    kzg.rs:601-621): the blob-major lane layout makes each device's shard of
    the [W, 6n] digit matrix self-contained, so every device gathers and
    tree-reduces its own blobs' lanes, the [2, 3, l] partial sums ride ONE
    all_gather over the mesh, and the replicated tail adds the single
    generator correction.  Point addition is associative, so the result is
    byte-identical to the single-chip kernel."""
    from ._compat import shard_map

    from ..ops import verify_kernels as V

    def local(b1, b2, dig, gt, syd):
        part = V.stage2_partials(b1, b2, dig)
        gathered = jax.lax.all_gather(part, BLOBS_AXIS)  # [D, 2, 3, l]
        lhs = C.tree_reduce(gathered[:, 0])
        rhs = C.tree_reduce(gathered[:, 1])
        rhs = C.proj_add(rhs, C.point_neg(V.gen_mult(gt, syd)))
        return jnp.stack([lhs, rhs], axis=0)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, BLOBS_AXIS, None, None),
            P(None, BLOBS_AXIS, None, None),
            P(None, BLOBS_AXIS),
            P(None, None, None, None, None),
            P(None, None),
        ),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(bases, bases2, digits, gen_table, sy_digits)
