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
    from jax.experimental.shard_map import shard_map

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
    from jax.experimental.shard_map import shard_map

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
