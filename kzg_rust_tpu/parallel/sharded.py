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


def default_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the point axis (MSM 'tensor parallelism')."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (POINTS_AXIS,))


class ShardedMsmContext:
    """MSM context whose window table is sharded over the point axis."""

    def __init__(self, n: int, table, fold: int, mesh: Mesh):
        self.n = n
        self.mesh = mesh
        self.fold = fold
        sharding = NamedSharding(mesh, P(None, None, POINTS_AXIS, None, None))
        self.table = jax.device_put(table, sharding)
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
            local_total = M.NUM_WINDOWS * (n // d)
            fold = min(8192, 1 << (local_total.bit_length() - 1))
        points = C.points_to_jacobian(points_affine)
        table = M._build_table_kernel(jnp.asarray(points))
        return cls(n, jax.block_until_ready(table), fold, mesh)

    @classmethod
    def build(cls, settings, mesh: Mesh, fold: int | None = None):
        return cls.build_from_points(settings.g1_values, mesh, fold)


@partial(jax.jit, static_argnums=(2, 3))
def _sharded_msm_kernel(table, digits, fold: int, mesh: Mesh):
    """shard_map over the point axis: local gather + fold-reduce per chip,
    all_gather of the [3, nlimbs] partials, small replicated reduction."""
    from jax.experimental.shard_map import shard_map

    def local(table_shard, digits_shard):
        partial_pt = M._msm_core(table_shard, digits_shard, fold)
        gathered = jax.lax.all_gather(partial_pt, POINTS_AXIS)  # [D, 3, l]
        d = gathered.shape[0]
        if d == 1:
            return gathered[0]
        return C.fold_reduce(gathered, d)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, POINTS_AXIS, None, None), P(None, POINTS_AXIS)),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(table, digits)


def msm_fixed_base_sharded(ctx: ShardedMsmContext, scalars):
    """Sharded fixed-base MSM; byte-identical result to the 1-chip path."""
    digits = M.recode_signed_digits(scalars, ctx.n)
    dig_sharding = NamedSharding(ctx.mesh, P(None, POINTS_AXIS))
    digits = jax.device_put(jnp.asarray(digits, dtype=jnp.int32), dig_sharding)
    out = _sharded_msm_kernel(ctx.table, digits, ctx.fold, ctx.mesh)
    return C.jacobian_to_points(np.asarray(out)[None])[0]


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
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (BLOBS_AXIS,))


@partial(jax.jit, static_argnums=(3, 4))
def sharded_batch_core_kernel(
    commitments, proofs, gen_table, n: int, mesh: Mesh, r_bits, rz_bits, y_digits
):
    """shard_map of :func:`ops.verify_kernels.batch_core_kernel` over the
    blob axis: each device runs the full per-blob combination on its shard
    (generator multiples, three ladders, local fold-reduce), the [2, 3, l]
    partial sums are all_gathered, and a tiny replicated reduction finishes.
    Point addition is associative, so the result is byte-identical to the
    single-chip kernel."""
    from jax.experimental.shard_map import shard_map

    from ..ops import verify_kernels as V

    d = mesh.devices.size

    def local(c_shard, p_shard, gt, rb, rzb, yd):
        part = V.batch_core(c_shard, p_shard, gt, n // d, rb, rzb, yd)
        gathered = jax.lax.all_gather(part, BLOBS_AXIS)  # [D, 2, 3, l]
        lhs = C.tree_reduce(gathered[:, 0])
        rhs = C.tree_reduce(gathered[:, 1])
        return jnp.stack([lhs, rhs], axis=0)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(BLOBS_AXIS, None, None),
            P(BLOBS_AXIS, None, None),
            P(None, None, None, None, None),
            P(None, BLOBS_AXIS),
            P(None, BLOBS_AXIS),
            P(None, BLOBS_AXIS),
        ),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(commitments, proofs, gen_table, r_bits, rz_bits, y_digits)
