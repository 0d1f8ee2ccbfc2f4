"""Bond constraints: projection accuracy, constrained dynamics stability."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu import (
    maxwell_boltzmann,
    minimize_fire,
    system_init,
    total_energy,
)
from molecular_dynamics_tpu.constraints import (
    apply_position_constraints,
    apply_velocity_constraints,
    constrained_langevin_step,
    constrained_temperature,
    constrained_velocity_verlet_step,
    hydrogen_bond_constraints,
)
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
from molecular_dynamics_tpu.integrate import initialize_forces, kinetic_energy


@pytest.fixture(scope="module")
def full_min():
    from molecular_dynamics_tpu.examples import decaalanine_full

    ff, coords, _ = decaalanine_full()
    force = lambda p: -jax.grad(
        lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
    )(p)
    pos = jax.jit(
        lambda p: minimize_fire(p, force, n_steps=1000, dt_start=1e-3, dt_max=1e-2)
    )(jnp.asarray(coords, jnp.float32))
    return ff, pos


def bond_errors(pos, cons):
    d = pos[cons.pairs[:, 0]] - pos[cons.pairs[:, 1]]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    return np.asarray(jnp.abs(dist - cons.lengths))


class TestProjections:
    def test_extraction(self, full_min):
        ff, pos = full_min
        cons = hydrogen_bond_constraints(ff)
        # deca-alanine full rep: every H has exactly one bond
        n_h = int(np.sum(np.asarray(ff.masses) < 3.5))
        assert cons.n_constraints == n_h
        assert cons.n_constraints > 40

    def test_position_projection_converges(self, full_min, rng):
        ff, pos = full_min
        cons = hydrogen_bond_constraints(ff)
        noisy = pos + jnp.asarray(rng.normal(0, 0.05, pos.shape), jnp.float32)
        fixed = jax.jit(
            lambda p: apply_position_constraints(p, cons, n_iter=30)
        )(noisy)
        assert bond_errors(fixed, cons).max() < 1e-4
        # heavy atoms barely move (mass weighting)
        heavy = np.asarray(ff.masses) > 3.5
        disp = np.linalg.norm(np.asarray(fixed - noisy), axis=1)
        assert disp[heavy].max() < 0.06

    def test_velocity_projection(self, full_min, rng):
        ff, pos = full_min
        cons = hydrogen_bond_constraints(ff)
        p = apply_position_constraints(jnp.asarray(pos), cons, 30)
        v = jnp.asarray(rng.normal(0, 0.3, pos.shape), jnp.float32)
        v2 = jax.jit(
            lambda vv: apply_velocity_constraints(vv, p, cons, n_iter=20)
        )(v)
        d = p[cons.pairs[:, 0]] - p[cons.pairs[:, 1]]
        dhat = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        vrel = jnp.sum(
            (v2[cons.pairs[:, 0]] - v2[cons.pairs[:, 1]]) * dhat, axis=-1
        )
        assert float(jnp.max(jnp.abs(vrel))) < 1e-4


class TestConstrainedDynamics:
    def test_rattle_nve_preserves_bonds_and_energy(self, full_min):
        ff, pos = full_min
        cons = hydrogen_bond_constraints(ff)
        force_fn = lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        )(p)
        pos = apply_position_constraints(pos, cons, 50)
        vel = maxwell_boltzmann(jax.random.PRNGKey(3), ff.masses, 300.0)
        vel = apply_velocity_constraints(vel, pos, cons, 30)
        state = initialize_forces(system_init(pos, vel=vel), force_fn)
        def make_step(dt):
            return functools.partial(
                constrained_velocity_verlet_step,
                force_fn=force_fn, masses=ff.masses, cons=cons, dt_fs=dt,
            )

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def run(s, n, dt):
            step = make_step(dt)
            return jax.lax.fori_loop(0, n, lambda _, x: step(x), s)

        def etot(s):
            return float(
                total_energy(s.pos, ff, config=REFERENCE_CONFIG)
                + kinetic_energy(s.vel, ff.masses)
            )

        e0 = etot(state)
        out = run(state, 2000, 1.0)  # 2 ps at 1 fs
        assert bond_errors(out.pos, cons).max() < 1e-3
        drift_1fs = abs(etot(out) - e0)
        assert drift_1fs < 5.0
        # the projection scheme is not exactly symplectic: at the full 2 fs
        # step NVE drifts slowly (production runs are NVT where the
        # thermostat absorbs it) — bounded, not exploding
        out2 = run(state, 1000, 2.0)
        assert bond_errors(out2.pos, cons).max() < 1e-3
        assert abs(etot(out2) - e0) < 100.0
        assert bool(jnp.all(jnp.isfinite(out2.pos)))

    def test_constrained_langevin_temperature(self, full_min):
        ff, pos = full_min
        cons = hydrogen_bond_constraints(ff)
        force_fn = lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        )(p)
        pos = apply_position_constraints(pos, cons, 50)
        state = initialize_forces(
            system_init(pos, key=jax.random.PRNGKey(7)), force_fn
        )
        step = functools.partial(
            constrained_langevin_step,
            force_fn=force_fn, masses=ff.masses, cons=cons,
            dt_fs=2.0, T=300.0, gamma_ps=5.0,
        )

        @jax.jit
        def run(s, n):
            return jax.lax.fori_loop(0, n, lambda _, x: step(x), s)

        s = run(state, 1500)
        temps = []
        for _ in range(10):
            s = run(s, 100)
            temps.append(
                float(
                    constrained_temperature(
                        kinetic_energy(s.vel, ff.masses),
                        ff.n_atoms,
                        cons.n_constraints,
                    )
                )
            )
        mean_t = float(np.mean(temps))
        assert 240.0 < mean_t < 360.0
        assert bond_errors(s.pos, cons).max() < 1e-3
