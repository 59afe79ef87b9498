"""Multi-host scale-out scaffolding (BASELINE config 5).

The reference is single-threaded host code (SURVEY.md section 2.4); this
module is the TPU-native multi-host story: one ``jax.distributed``
initialization entry point and a 2-axis ``(host, chip)`` mesh over which
the blob axis of batch verification shards across BOTH axes — the
per-stage ``all_gather`` of [2, 3, l] partial point sums then rides ICI
within a host and DCN across hosts.  Communication per batch is
O(devices) small point tensors (~600 B each), independent of blob count,
so blobs/s scales linearly with hosts until the DCN latency floor meets
the per-shard compute time (SCALING.md).

Validated without a pod: the same program runs on a single-process virtual
2x4 CPU mesh (tests/test_parallel_distributed.py), which exercises the
exact (host, chip) PartitionSpecs a real pod would compile.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

HOST_AXIS = "host"
CHIP_AXIS = "chip"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join (or start) a multi-host JAX runtime.

    Thin, explicit wrapper over ``jax.distributed.initialize`` so deployments
    have one documented entry point; arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID environment
    variables (None lets JAX auto-detect on supported platforms).  Call
    BEFORE any other JAX API, once per process.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_chip_mesh(
    n_hosts: int | None = None, chips_per_host: int | None = None
) -> Mesh:
    """A 2-axis ``(host, chip)`` mesh over all visible devices.

    On a real pod ``jax.devices()`` spans every process and the host axis
    follows process boundaries (devices are ordered by process), so the
    chip-axis collectives stay on ICI.  On a single process this builds the
    virtual equivalent (e.g. 2x4 over 8 forced CPU devices).
    """
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    total = n_hosts * chips_per_host
    grid = np.array(devs[:total]).reshape(n_hosts, chips_per_host)
    return Mesh(grid, (HOST_AXIS, CHIP_AXIS))


# Blob axis sharded over BOTH mesh axes: shard_map specs use the tuple
# ("host", "chip"), so a [B, ...] input splits into B / (H*C) rows per
# device and the combines all_gather over both axes (ICI then DCN).
_BLOB_SPEC = (HOST_AXIS, CHIP_AXIS)


@partial(jax.jit, static_argnums=1)
def batch_points_kernel_2axis(comp_bytes, mesh: Mesh):
    """2-axis version of ``sharded.sharded_batch_points_kernel``: stage 1 of
    batch verification with the point rows sharded over host x chip."""
    from ._compat import shard_map

    from ..ops import verify_kernels as V

    def local(comp_shard):
        bases, bases2, flags = V.batch_points(comp_shard)
        gathered = jax.lax.all_gather(flags, _BLOB_SPEC)
        return bases, bases2, jnp.min(gathered.reshape(-1, 2), axis=0)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(_BLOB_SPEC, None),),
        out_specs=(
            P(None, _BLOB_SPEC, None, None),
            P(None, _BLOB_SPEC, None, None),
            P(None),
        ),
        check_rep=False,
    )
    return fn(comp_bytes)


@partial(jax.jit, static_argnums=5)
def batch_stage2_kernel_2axis(bases, bases2, digits, gen_table, sy_digits, mesh: Mesh):
    """2-axis version of ``sharded.sharded_batch_stage2_kernel``: each device
    reduces its own blobs' lanes; the [2, 3, l] partials all_gather over
    (chip, host) — ICI first, DCN once per host."""
    from ._compat import shard_map

    from ..ops import curve as C
    from ..ops import verify_kernels as V

    def local(b1, b2, dig, gt, syd):
        part = V.stage2_partials(b1, b2, dig)
        gathered = jax.lax.all_gather(part, _BLOB_SPEC)  # [H*C, 2, 3, l]
        gathered = gathered.reshape((-1,) + part.shape)
        lhs = C.tree_reduce(gathered[:, 0])
        rhs = C.tree_reduce(gathered[:, 1])
        rhs = C.proj_add(rhs, C.point_neg(V.gen_mult(gt, syd)))
        return jnp.stack([lhs, rhs], axis=0)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, _BLOB_SPEC, None, None),
            P(None, _BLOB_SPEC, None, None),
            P(None, _BLOB_SPEC),
            P(None, None, None, None, None),
            P(None, None),
        ),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(bases, bases2, digits, gen_table, sy_digits)


# ---------------------------------------------------------------------------
# 2-axis point-sharded fixed-base MSM (prover scale-out on a real pod)
# ---------------------------------------------------------------------------
#
# The 1-axis ShardedMsmContext (parallel/sharded.py) places the trusted-setup
# point axis over a flat device list; on a pod that ignores the ICI/DCN
# distinction.  This variant shards the point axis over host x chip exactly
# like the batch-verification stages above, and its partial-sum all_gather
# runs (chip, host) — ICI within a host first, one DCN hop per host
# (VERDICT round-3 item 7; reference hot kernel: src/utils.rs:399-406).

_POINT_SPEC = (HOST_AXIS, CHIP_AXIS)


class ShardedMsmContext2Axis:
    """GLV fixed-base MSM context whose affine window table is sharded over
    the (host, chip) mesh (table layout:
    :func:`kzg_rust_tpu.ops.msm._build_glv_table_kernel`); each device holds
    ~1/(H*C) of the table (mainnet: ~436 MB / devices)."""

    def __init__(self, n: int, table, inf_mask, fold: int, mesh: Mesh):
        self.n = n
        self.mesh = mesh
        self.fold = fold
        self.table = table
        self.inf_mask = inf_mask

    @classmethod
    def build_from_points(cls, points_affine, mesh: Mesh, fold: int | None = None):
        from jax.sharding import NamedSharding

        from ..ops import curve as C
        from ..ops import msm as M

        n = len(points_affine)
        d = mesh.devices.size
        if n % d != 0:
            raise ValueError(f"point count {n} not divisible by mesh size {d}")
        if fold is None:
            local_total = 2 * M.GLV_NUM_WINDOWS * (n // d)
            fold = min(8192, 1 << (local_total.bit_length() - 1))
        points = C.points_to_jacobian(points_affine)
        # Build under sharded out-shardings so each device materializes only
        # its shard (same peak-HBM argument as the 1-axis build).
        psharding = NamedSharding(mesh, P(_POINT_SPEC, None, None))
        pts_dev = jax.device_put(jnp.asarray(points), psharding)
        tsharding = NamedSharding(mesh, P(None, None, _POINT_SPEC, None, None))
        isharding = NamedSharding(mesh, P(_POINT_SPEC))
        table, inf_mask = jax.jit(
            M._build_glv_table_kernel, out_shardings=(tsharding, isharding)
        )(pts_dev)
        return cls(n, jax.block_until_ready(table), inf_mask, fold, mesh)

    @classmethod
    def build(cls, settings, mesh: Mesh, fold: int | None = None):
        return cls.build_from_points(settings.g1_values, mesh, fold)


@partial(jax.jit, static_argnums=(4, 5))
def _msm_kernel_2axis(table, inf_mask, d1, d2, fold: int, mesh: Mesh):
    """shard_map over (host, chip): local gather + mixed-add fold per
    device, all_gather of the [3, l] partials over (chip, host) — ICI
    first, then DCN — and a small replicated tree reduction (point addition
    is associative, so the gather order does not change the sum)."""
    from ._compat import shard_map

    from ..ops import curve as C
    from ..ops import msm as M

    def local(table_shard, inf_shard, d1_shard, d2_shard):
        part = M._msm_core_glv(table_shard, inf_shard, d1_shard, d2_shard, fold)
        gathered = jax.lax.all_gather(part, (CHIP_AXIS, HOST_AXIS))
        return C.tree_reduce(gathered.reshape((-1,) + part.shape))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, _POINT_SPEC, None, None),
            P(_POINT_SPEC),
            P(None, _POINT_SPEC),
            P(None, _POINT_SPEC),
        ),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(table, inf_mask, d1, d2)


def msm_fixed_base_2axis(ctx: ShardedMsmContext2Axis, scalars):
    """2-axis sharded fixed-base MSM; same group element as the 1-chip path
    (reduction order differs, the decoded affine point is identical)."""
    from jax.sharding import NamedSharding

    from ..ops import curve as C
    from ..ops import msm as M

    d1, d2 = M.recode_glv_host(scalars)
    dig_sharding = NamedSharding(ctx.mesh, P(None, _POINT_SPEC))
    d1 = jax.device_put(jnp.asarray(d1, dtype=jnp.int32), dig_sharding)
    d2 = jax.device_put(jnp.asarray(d2, dtype=jnp.int32), dig_sharding)
    out = _msm_kernel_2axis(ctx.table, ctx.inf_mask, d1, d2, ctx.fold, ctx.mesh)
    import numpy as np

    return C.jacobian_to_points(np.asarray(out)[None])[0]
