"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    n_devices: Optional[int] = None, axis_name: str = "replica"
) -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices.

    MD replica ensembles and data-parallel training both shard one leading
    axis, so a 1-D mesh covers every reference workload; multi-axis meshes
    (e.g. replica x model) can be built directly with jax.sharding for
    larger systems.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(devs)} "
            f"devices are visible (set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            f"with JAX_PLATFORMS=cpu to emulate)"
        )
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def shard_ensemble(states, mesh: Mesh, axis_name: str = "replica"):
    """Shard the leading replica axis of an ensemble pytree over the mesh.

    Replica counts must divide the mesh size. Integration then runs fully
    sharded: XLA partitions the vmapped step with zero collectives (each
    replica is independent), so throughput scales linearly over ICI.
    """
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, states)


def shard_batch(batch, mesh: Mesh, axis_name: str = "replica"):
    """Shard the leading (batch) axis of an array pytree over the mesh."""
    return shard_ensemble(batch, mesh, axis_name)


def shard_campaign_advance(advance, mesh: Mesh, axis_name: str = "replica"):
    """shard_map a fused-campaign ``advance`` op over the replica axis.

    The Pallas campaign kernel is a custom call XLA's SPMD partitioner
    cannot split on its own, so multi-chip campaigns wrap it in
    ``jax.shard_map``: each device runs the kernel on its local replica
    shard (replicas are independent — zero collectives, linear ICI
    scaling, same story as ``shard_ensemble`` for the composed path).

    The kernel derives per-program thermostat streams from
    ``seed + program_id``, so each shard offsets ``seed`` by
    ``axis_index * local_program_count`` — without this, shards would
    replay identical noise (the cross-shard analog of the in-kernel
    program_id offset).
    """
    spec3 = P(axis_name, None, None)

    def body(pos, vel, frc, t0, seed):
        idx = jax.lax.axis_index(axis_name)
        # ceil: the kernel pads local replicas UP to a block multiple and
        # seeds per program_id, so a floor stride would overlap the PRNG
        # streams of adjacent shards whenever block_r does not divide the
        # local replica count
        n_prog = max(
            -(-pos.shape[0] // advance.block_r), 1
        )
        return advance(pos, vel, frc, t0, seed + idx * n_prog)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, P(), P()),
        out_specs=(spec3, spec3, spec3),
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )
    sharded.n_inner = advance.n_inner
    return sharded


def replicate_params(params, mesh: Mesh):
    """Fully replicate a parameter pytree across the mesh."""
    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(*([None] * getattr(x, "ndim", 0))))
        )

    return jax.tree.map(put, params)
