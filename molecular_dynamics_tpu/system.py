"""Functional MD simulation state.

The reference mutates a ``System`` of ``pos/vel/box/forces`` tensors in place
(TorchMD_Fix/systems.py:6-85). The TPU-native equivalent is an immutable
pytree ``MDState``; integrator steps are pure ``state -> state`` functions
that jit, scan and vmap. A replica ensemble is the same pytree with a leading
replica axis (the reference's ``nreplicas`` axis, systems.py:11-14), produced
by ``jax.vmap`` — not a Python loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MDState:
    """State of one system (or, with a leading axis, a replica ensemble).

    - ``pos``/``vel``/``forces``: (N, 3) in Angstrom / Angstrom per AKMA time
      / kcal/mol/Angstrom
    - ``box``: (3,) rectangular box diagonal; zeros mean vacuum
    - ``key``: PRNG key threading the thermostat noise
    - ``step``: int32 step counter (drives time-dependent biases)
    """

    pos: jnp.ndarray
    vel: jnp.ndarray
    forces: jnp.ndarray
    box: jnp.ndarray
    key: jax.Array
    step: jnp.ndarray

    @property
    def n_atoms(self) -> int:
        return self.pos.shape[-2]


def system_init(
    pos: jnp.ndarray,
    *,
    vel: Optional[jnp.ndarray] = None,
    box: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> MDState:
    """Create an :class:`MDState` from positions (velocities default to 0)."""
    pos = jnp.asarray(pos, dtype)
    if vel is None:
        vel = jnp.zeros_like(pos)
    if box is None:
        box = jnp.zeros((3,), dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    return MDState(
        pos=pos,
        vel=jnp.asarray(vel, dtype),
        forces=jnp.zeros_like(pos),
        box=jnp.asarray(box, dtype),
        key=key,
        step=jnp.zeros((), jnp.int32),
    )


def wrap_positions(
    pos: jnp.ndarray, box: jnp.ndarray, center: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Wrap coordinates back into the primary box for visualisation.

    The torchmd ``Wrapper`` step of the reference's dynamics loop
    (Test-1/tutorial.ipynb cell 13/18). No-op on zero-box (vacuum) axes.
    """
    box = jnp.asarray(box, pos.dtype)
    if center is None:
        center = jnp.mean(pos, axis=-2, keepdims=True)
    safe = jnp.where(box > 0, box, 1.0)
    shift = safe * jnp.round((pos - center) / safe)
    return jnp.where(box > 0, pos - shift, pos)


def replicate(state: MDState, n_replicas: int, seed: int = 0) -> MDState:
    """Broadcast a single-system state to a replica ensemble.

    Every replica gets an independent PRNG key so thermostat noise decorrelates
    the ensemble (the reference fans replicas out as independent SLURM jobs;
    here they are one leading array axis, SURVEY.md §2.13).
    """
    keys = jax.random.split(jax.random.PRNGKey(seed), n_replicas)
    tiled = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_replicas,) + x.shape), state
    )
    return tiled.replace(key=keys)
