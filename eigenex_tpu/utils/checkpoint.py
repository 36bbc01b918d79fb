"""Checkpoint / resume of solver state.

The reference's resume feature is in-memory only
(``continueToCompute``, lanczos.hpp:696-712); state is never
serialized.  Here the solver state is an explicit pytree
(:class:`~eigenex_tpu.solvers.lanczos.LanczosState` /
:class:`~eigenex_tpu.solvers.arnoldi.ArnoldiState`), so persistence
across process restarts/preemptions is a flat ``np.savez`` round-trip —
``continue_to_compute`` on the restored state picks up exactly where
the saved run stopped.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..utils.exceptions import EigenexError

__all__ = ["save_state", "load_state", "shard_state", "state_to_dict", "state_from_dict"]


def state_to_dict(state) -> dict:
    """Flatten a solver-state dataclass pytree into {field: np.ndarray}."""
    if not dataclasses.is_dataclass(state):
        raise EigenexError(f"not a solver state: {type(state)}")
    return {
        f.name: np.asarray(getattr(state, f.name)) for f in dataclasses.fields(state)
    }


def state_from_dict(cls, d: dict):
    import jax.numpy as jnp

    fields = {f.name for f in dataclasses.fields(cls)}
    missing = fields - set(d)
    if missing == {"failed"}:
        # checkpoints written before the NaN/Inf failure flag existed
        d = dict(d)
        d["failed"] = np.zeros((), np.bool_)
        missing = set()
    if missing:
        raise EigenexError(f"checkpoint missing fields {sorted(missing)} for {cls.__name__}")
    return cls(**{k: jnp.asarray(v) for k, v in d.items() if k in fields})


def save_state(path: str, state) -> None:
    """Serialize a solver state (LanczosState/ArnoldiState) to ``path``."""
    d = state_to_dict(state)
    d["__class__"] = np.array(type(state).__name__)
    np.savez(path, **d)


def load_state(path: str, *, mesh=None, axis_name: str | None = None):
    """Restore a solver state saved by :func:`save_state`.

    mesh: a ``jax.sharding.Mesh`` re-shards the restored state for the
    distributed drivers — the Krylov basis ``V`` is placed
    ``P(None, axis)`` (rows replicated, columns row-partitioned, the
    layout :func:`~eigenex_tpu.parallel.distributed.distributed_lanczos_steps`
    carries) and the small fields (α/β/H/k/flags) replicated, so a
    resumed mesh run never materializes a replicated basis per device.
    ``axis_name`` defaults to the mesh's first axis.
    """
    from ..solvers.arnoldi import ArnoldiState
    from ..solvers.lanczos import LanczosState

    classes = {"LanczosState": LanczosState, "ArnoldiState": ArnoldiState}
    with np.load(path, allow_pickle=False) as z:
        name = str(z["__class__"])
        if name not in classes:
            raise EigenexError(f"unknown state class {name!r} in checkpoint")
        state = state_from_dict(
            classes[name], {k: z[k] for k in z.files if k != "__class__"}
        )
    if mesh is None:
        return state
    return shard_state(state, mesh, axis_name=axis_name)


def shard_state(state, mesh, *, axis_name: str | None = None):
    """Place a (host or single-device) solver state onto ``mesh`` in the
    distributed drivers' layout: basis ``V`` sharded ``P(None, axis)``,
    everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis_name is None:
        axis_name = mesh.axis_names[0]
    nd = mesh.shape[axis_name]
    n = state.V.shape[1]
    if n % nd:
        raise EigenexError(
            f"basis width {n} not divisible by {nd} mesh shards — the "
            "checkpoint was not written by a mesh-padded run"
        )
    repl = NamedSharding(mesh, P())
    vspec = NamedSharding(mesh, P(None, axis_name))
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        out[f.name] = jax.device_put(v, vspec if f.name == "V" else repl)
    return type(state)(**out)
