"""Device-mesh helpers and multi-host initialization.

The reference has **no** parallelism or communication backend of any
kind (SURVEY.md §2: no MPI/NCCL/threads anywhere) — this subsystem is
net-new, mandated by BASELINE.json's north star: operators row/block-
partitioned over a TPU pod slice, collectives over ICI via
``shard_map``/``pjit``, multi-host process groups via
``jax.distributed``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "row_sharding", "replicated_sharding", "initialize_multihost"]

#: canonical mesh-axis name for the row partition of operators/vectors
ROWS = "rows"


def make_mesh(n_devices: int | None = None, axis_name: str = ROWS, devices=None) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all local devices).

    The row axis is the SpMV analog of data/tensor parallelism: operator
    block rows, vector segments, and the Krylov basis columns all shard
    over it (SURVEY.md §5).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str = ROWS, ndim: int = 1, axis: int = 0):
    """NamedSharding that shards array axis ``axis`` over the mesh rows."""
    spec = [None] * ndim
    spec[axis] = axis_name
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, PartitionSpec())


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the multi-host process group (DCN across hosts, ICI
    within a slice) — thin wrapper over ``jax.distributed.initialize``
    so single-host use needs no call at all."""
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
