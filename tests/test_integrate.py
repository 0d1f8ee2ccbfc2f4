"""Integrator physics: NVE energy drift, Langevin thermostat, MB velocities.

Covers BASELINE.md's NVE-drift config and the thermostat behaviour the
reference delegates to NAMD/torchmd (SURVEY.md §2.12).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, total_energy
from molecular_dynamics_tpu.system import system_init, replicate
from molecular_dynamics_tpu.integrate import (
    velocity_verlet_step,
    langevin_step,
    maxwell_boltzmann,
    kinetic_energy,
    temperature,
    minimize_fire,
    initialize_forces,
)


@pytest.fixture(scope="module")
def relaxed(backbone_system):
    """Energy-minimised decaalanine (f64) shared across integrator tests."""
    top, ff, coords = backbone_system

    def force(p):
        return -jax.grad(lambda q: total_energy(q, ff, config=REFERENCE_CONFIG))(p)

    mini = jax.jit(
        lambda p: minimize_fire(p, force, n_steps=2000, dt_start=0.001, dt_max=0.01)
    )
    pos = mini(jnp.asarray(coords, jnp.float64))
    e0 = float(total_energy(pos, ff, config=REFERENCE_CONFIG))
    e_start = float(
        total_energy(jnp.asarray(coords, jnp.float64), ff, config=REFERENCE_CONFIG)
    )
    assert e0 < e_start  # minimization reduced energy
    return top, ff, pos


def make_force_fn(ff):
    def force_fn(pos, box):
        return -jax.grad(
            lambda p: total_energy(p, ff, box=box, config=REFERENCE_CONFIG)
        )(pos)

    return force_fn


class TestNVE:
    def test_energy_conservation(self, relaxed):
        """10k velocity-Verlet steps at 0.5 fs: bounded total-energy drift
        (BASELINE.md NVE config)."""
        top, ff, pos = relaxed
        force_fn = make_force_fn(ff)
        key = jax.random.PRNGKey(7)
        vel = maxwell_boltzmann(key, ff.masses, 300.0)
        state = initialize_forces(
            system_init(pos, vel=vel, key=key, dtype=jnp.float64), force_fn
        )

        step = functools.partial(
            velocity_verlet_step, force_fn=force_fn, masses=ff.masses, dt_fs=0.5
        )

        @jax.jit
        def run(state, n):
            return jax.lax.fori_loop(0, n, lambda _, s: step(s), state)

        def etot(s):
            return float(
                total_energy(s.pos, ff, config=REFERENCE_CONFIG)
                + kinetic_energy(s.vel, ff.masses)
            )

        e0 = etot(state)
        final = run(state, 10_000)
        e1 = etot(final)
        # tight drift bound in f64: well under 0.2 kcal/mol over 5 ps
        assert abs(e1 - e0) < 0.2
        assert bool(jnp.all(jnp.isfinite(final.pos)))

    def test_reversibility(self, relaxed):
        """Velocity-Verlet is time-reversible: run forward, flip velocities,
        run back, recover the initial state."""
        top, ff, pos = relaxed
        force_fn = make_force_fn(ff)
        vel = maxwell_boltzmann(jax.random.PRNGKey(3), ff.masses, 300.0)
        state = initialize_forces(
            system_init(pos, vel=vel, dtype=jnp.float64), force_fn
        )
        step = functools.partial(
            velocity_verlet_step, force_fn=force_fn, masses=ff.masses, dt_fs=0.5
        )

        @jax.jit
        def run(s, n):
            return jax.lax.fori_loop(0, n, lambda _, x: step(x), s)

        fwd = run(state, 200)
        back = run(fwd.replace(vel=-fwd.vel), 200)
        np.testing.assert_allclose(
            np.asarray(back.pos), np.asarray(state.pos), atol=1e-8
        )


class TestLangevin:
    def test_thermostat_reaches_target_temperature(self, relaxed):
        top, ff, pos = relaxed
        force_fn = make_force_fn(ff)
        state = initialize_forces(
            system_init(pos, key=jax.random.PRNGKey(11), dtype=jnp.float64),
            force_fn,
        )
        step = functools.partial(
            langevin_step,
            force_fn=force_fn,
            masses=ff.masses,
            dt_fs=1.0,
            T=300.0,
            gamma_ps=5.0,
        )

        @jax.jit
        def run(s, n):
            return jax.lax.fori_loop(0, n, lambda _, x: step(x), s)

        # equilibrate from zero velocities, then average T over segments
        s = run(state, 4000)
        temps = []
        for _ in range(20):
            s = run(s, 200)
            temps.append(
                float(temperature(kinetic_energy(s.vel, ff.masses), ff.masses.shape[0]))
            )
        mean_t = float(np.mean(temps))
        assert 230.0 < mean_t < 370.0  # 40-atom system: generous band

    def test_vmapped_replicas_decorrelate(self, relaxed):
        top, ff, pos = relaxed
        force_fn = make_force_fn(ff)
        state = initialize_forces(
            system_init(pos, dtype=jnp.float64), force_fn
        )
        ensemble = replicate(state, 4, seed=5)
        step = functools.partial(
            langevin_step,
            force_fn=force_fn,
            masses=ff.masses,
            dt_fs=1.0,
            T=300.0,
            gamma_ps=1.0,
        )

        @jax.jit
        def run(states, n):
            return jax.lax.fori_loop(
                0, n, lambda _, s: jax.vmap(step)(s), states
            )

        out = run(ensemble, 300)
        # replicas received different noise -> different trajectories
        flat = np.asarray(out.pos).reshape(4, -1)
        dists = [np.linalg.norm(flat[0] - flat[i]) for i in range(1, 4)]
        assert min(dists) > 1e-3
        assert bool(jnp.all(jnp.isfinite(out.pos)))


class TestMaxwellBoltzmann:
    def test_velocity_statistics(self):
        masses = jnp.full((2000,), 12.011, jnp.float64)
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), masses, 300.0)
        t = float(temperature(kinetic_energy(vel, masses), 2000))
        assert t == pytest.approx(300.0, rel=0.05)


class TestDifferentiability:
    def test_backprop_through_rollout(self, relaxed):
        """Gradient flows through a 50-step integrator rollout to the
        initial positions — the HNN / force-bias-GAN training requirement
        (BASELINE.md 'Differentiability')."""
        top, ff, pos = relaxed
        force_fn = make_force_fn(ff)
        step = functools.partial(
            velocity_verlet_step, force_fn=force_fn, masses=ff.masses, dt_fs=0.5
        )

        @jax.jit
        def loss(p0):
            s = initialize_forces(system_init(p0, dtype=jnp.float64), force_fn)
            s = jax.lax.fori_loop(0, 50, lambda _, x: step(x), s)
            return jnp.sum(s.pos**2)

        g = jax.jit(jax.grad(loss))(pos)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.linalg.norm(g)) > 0


class TestLBFGS:
    def test_quadratic_exact(self):
        """On a quadratic bowl L-BFGS converges to the minimum."""
        from molecular_dynamics_tpu import minimize_lbfgs

        target = jnp.asarray(
            np.random.default_rng(0).normal(size=(7, 3)), jnp.float64
        )
        scale = jnp.asarray(
            np.random.default_rng(1).uniform(0.5, 4.0, size=(7, 3))
        )
        e = lambda p: jnp.sum(scale * (p - target) ** 2)
        x = minimize_lbfgs(jnp.zeros((7, 3), jnp.float64), e, n_steps=60)
        np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-6)

    def test_beats_fire_on_decaalanine(self, backbone_system):
        """Same step budget: L-BFGS reaches a (much) lower energy than FIRE
        and never diverges on the stiff initial LJ contacts."""
        from molecular_dynamics_tpu import minimize_lbfgs

        top, ff, coords = backbone_system
        e_fn = lambda p: total_energy(p, ff, config=REFERENCE_CONFIG)
        pos0 = jnp.asarray(coords, jnp.float64)

        def force(p):
            return -jax.grad(e_fn)(p)

        p_fire = jax.jit(
            lambda p: minimize_fire(
                p, force, n_steps=150, dt_start=0.001, dt_max=0.01
            )
        )(pos0)
        p_lbfgs = jax.jit(
            lambda p: minimize_lbfgs(p, e_fn, n_steps=150)
        )(pos0)
        e_start = float(e_fn(pos0))
        e_fire = float(e_fn(p_fire))
        e_lbfgs = float(e_fn(p_lbfgs))
        assert np.isfinite(e_lbfgs)
        assert e_lbfgs < e_fire < e_start
