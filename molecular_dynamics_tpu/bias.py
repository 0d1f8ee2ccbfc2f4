"""Bias potentials (steered-MD colvars) as first-class force hooks.

The reference applies its moving harmonic end-to-end-distance bias in two
places: as a NAMD colvar when generating data
(All_ML_Training_Data/.../SMD/gendirs_GBIS.py:105-131) and as an extra
energy term bolted onto the Energy module for training losses
(V_Calculations/Test-5_bias_n_improper/potcalc.py:75-89). Here a bias is a
pytree with a differentiable ``energy(pos, step)``; the integrator gets the
bias force for free through ``jax.grad`` of the total energy, so the same
object both *steers simulations* and *scores generated structures*.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


@struct.dataclass
class HarmonicSMDBias:
    """Moving harmonic restraint on the distance between two atom groups.

    ``E(t) = 0.5 * fk * (center(t) - |com2 - com1|)^2`` with
    ``center(t)`` linearly interpolated from ``cent_0`` to ``cent_1`` over
    ``T`` steps — the reference's canonical colvar dict
    ``{fk: 1.0, cent_0: 12.0, cent_1: 34.0, T: 500000/50, group1: [0],
    group2: [39]}`` (Test-5_bias_n_improper/potcalc.py:99-107), mirroring the
    NAMD SMD colvar that produced the decaalanine training data.

    Group membership is a static weight vector (so jit sees fixed shapes);
    centres are unweighted means over the group like the reference's
    single-atom groups generalised to n-atom groups.
    """

    fk: Array
    cent_0: Array
    cent_1: Array
    T: Array
    group1_w: Array  # (N,) normalized membership weights
    group2_w: Array

    @classmethod
    def create(
        cls,
        n_atoms: int,
        group1: Sequence[int],
        group2: Sequence[int],
        fk: float = 1.0,
        cent_0: float = 12.0,
        cent_1: float = 34.0,
        T: float = 10000.0,
        dtype=jnp.float32,
    ) -> "HarmonicSMDBias":
        w1 = jnp.zeros((n_atoms,), dtype).at[jnp.asarray(list(group1))].set(1.0)
        w2 = jnp.zeros((n_atoms,), dtype).at[jnp.asarray(list(group2))].set(1.0)
        return cls(
            fk=jnp.asarray(fk, dtype),
            cent_0=jnp.asarray(cent_0, dtype),
            cent_1=jnp.asarray(cent_1, dtype),
            T=jnp.asarray(T, dtype),
            group1_w=w1 / jnp.sum(w1),
            group2_w=w2 / jnp.sum(w2),
        )

    def center(self, step: Array) -> Array:
        """Restraint centre at integration step ``step``: linear schedule,
        held at ``cent_1`` past ``T`` steps — NAMD colvars keeps
        ``targetCenters`` after ``targetNumSteps`` (pinned against replica
        0's recorded post-schedule MISC energy, tests/test_namd_golden.py);
        the reference's python Energy only ever evaluates within [0, T]
        (Test-5_bias_n_improper/potcalc.py:80-88), where the schedules
        agree exactly."""
        t = jnp.minimum(jnp.asarray(step, self.cent_0.dtype), self.T)
        return (self.cent_1 - self.cent_0) / self.T * t + self.cent_0

    def colvar(self, pos: Array) -> Array:
        """Current collective variable value: inter-group distance."""
        com1 = self.group1_w @ pos
        com2 = self.group2_w @ pos
        delta = com2 - com1
        return jnp.sqrt(jnp.sum(delta * delta) + 1e-12)

    def energy(self, pos: Array, step: Array) -> Array:
        dist = self.colvar(pos)
        return 0.5 * self.fk * (self.center(step) - dist) ** 2


def end_to_end_distance(pos: Array, i: int = 0, j: int = -1) -> Array:
    """Distance between two atoms — the reference's ubiquitous e2e metric
    (e.g. Molecule_Dynamics_GAN/GAN_V12.3.1_*/test.py:31-55)."""
    delta = pos[..., j, :] - pos[..., i, :]
    return jnp.sqrt(jnp.sum(delta * delta, axis=-1))
