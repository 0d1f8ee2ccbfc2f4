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


def test_batched_constrained_step_matches_vmapped():
    """The matmul-projection batched g-BAOAB equals the per-system scatter
    implementation (same Jacobi fixed point, T=0 deterministic)."""
    from molecular_dynamics_tpu.examples import decaalanine_full
    from molecular_dynamics_tpu.constraints import (
        constrained_langevin_step,
        make_batched_constrained_langevin_step,
    )

    ff, coords, _ = decaalanine_full()
    cons = hydrogen_bond_constraints(ff)
    pot = lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
    force1 = lambda p, b: -jax.grad(pot)(p)
    pos = jax.jit(
        lambda p: minimize_fire(
            p, lambda q: force1(q, None), n_steps=300,
            dt_start=1e-3, dt_max=1e-2,
        )
    )(jnp.asarray(coords, jnp.float32))
    vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
    state = system_init(pos, vel=vel.astype(jnp.float32), key=jax.random.PRNGKey(1))
    state = initialize_forces(state, force1)
    ens = replicate(state, 3, seed=2)

    batched_force = lambda p, b: -jax.vmap(jax.grad(pot))(p)
    batched = make_batched_constrained_langevin_step(
        batched_force, ff.masses, cons, dt_fs=2.0, T=0.0, gamma_ps=1.0
    )
    out_b = jax.jit(batched)(ens)

    single = jax.jit(
        jax.vmap(
            lambda s: constrained_langevin_step(
                s, force1, ff.masses, cons, dt_fs=2.0, T=0.0, gamma_ps=1.0
            )
        )
    )
    out_v = single(ens)
    np.testing.assert_allclose(
        np.asarray(out_b.pos), np.asarray(out_v.pos), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_b.vel), np.asarray(out_v.vel), atol=5e-4
    )
