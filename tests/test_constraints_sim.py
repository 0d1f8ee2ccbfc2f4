"""Constrained ensemble simulation through the sim layer."""

import numpy as np
import jax
import jax.numpy as jnp

from molecular_dynamics_tpu import (
    maxwell_boltzmann,
    minimize_fire,
    system_init,
    total_energy,
)
from molecular_dynamics_tpu.constraints import hydrogen_bond_constraints
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
from molecular_dynamics_tpu.integrate import initialize_forces
from molecular_dynamics_tpu.sim import SimulationConfig, simulate_ensemble
from molecular_dynamics_tpu.system import replicate


def test_constrained_ensemble_campaign():
    from molecular_dynamics_tpu.examples import decaalanine_full

    ff, coords, _ = decaalanine_full()
    cons = hydrogen_bond_constraints(ff)
    force = lambda p, b: -jax.grad(
        lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
    )(p)
    pos = jax.jit(
        lambda p: minimize_fire(
            p, lambda q: force(q, None), n_steps=500,
            dt_start=1e-3, dt_max=1e-2,
        )
    )(jnp.asarray(coords, jnp.float32))
    state = system_init(
        pos,
        vel=maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0),
        key=jax.random.PRNGKey(0),
    )
    state = initialize_forces(state, force)
    ens = replicate(state, 4, seed=1)

    cfg = SimulationConfig(dt_fs=2.0, constrain_h_bonds=True)
    final, frames, log = simulate_ensemble(
        ens, ff, n_steps=100, save_every=50, config=cfg
    )
    assert frames.shape == (2, 4, ff.n_atoms, 3)
    assert bool(jnp.all(jnp.isfinite(frames)))
    # H-bond lengths pinned at their equilibrium values in every replica
    d = frames[-1][:, np.asarray(cons.pairs[:, 0])] - frames[-1][
        :, np.asarray(cons.pairs[:, 1])
    ]
    dist = np.linalg.norm(np.asarray(d), axis=-1)
    err = np.abs(dist - np.asarray(cons.lengths)[None, :])
    assert err.max() < 1e-3
