"""SMD bias: schedule, energy values, and actual steering of dynamics."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu.bias import HarmonicSMDBias, end_to_end_distance
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, total_energy
from molecular_dynamics_tpu.system import system_init
from molecular_dynamics_tpu.integrate import langevin_step, initialize_forces


def make_bias(fk=1.0):
    # the reference's canonical colvar (Test-5 potcalc.py:99-107)
    return HarmonicSMDBias.create(
        n_atoms=40,
        group1=[0],
        group2=[39],
        fk=fk,
        cent_0=12.0,
        cent_1=34.0,
        T=10000.0,
        dtype=jnp.float64,
    )


class TestSchedule:
    def test_center_interpolation(self):
        b = make_bias()
        assert float(b.center(0)) == pytest.approx(12.0)
        assert float(b.center(5000)) == pytest.approx(23.0)
        assert float(b.center(10000)) == pytest.approx(34.0)

    def test_energy_value(self, backbone_system, rng):
        top, ff, coords = backbone_system
        b = make_bias(fk=2.5)
        pos = jnp.asarray(coords)
        d = float(
            np.linalg.norm(np.asarray(coords)[39] - np.asarray(coords)[0])
        )
        e = float(b.energy(pos, jnp.asarray(0)))
        assert e == pytest.approx(0.5 * 2.5 * (12.0 - d) ** 2, rel=1e-6)
        assert float(end_to_end_distance(pos, 0, 39)) == pytest.approx(d, rel=1e-9)


class TestSteering:
    def test_smd_pulls_end_to_end_distance(self, backbone_system):
        """A strong moving restraint steers e2e toward its schedule — the
        core of regenerating the 210905_SMD_decaalanine campaign on-TPU."""
        top, ff, coords = backbone_system
        # relax the generated starting structure first (NAMD: minimize 500)
        from molecular_dynamics_tpu.integrate import minimize_fire

        relax_force = lambda p: -jax.grad(
            lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        )(p)
        coords = jax.jit(
            lambda p: minimize_fire(
                p, relax_force, n_steps=2000, dt_start=0.001, dt_max=0.01
            )
        )(jnp.asarray(coords, jnp.float64))
        d_start = float(end_to_end_distance(coords, 0, 39))
        bias = HarmonicSMDBias.create(
            n_atoms=40, group1=[0], group2=[39],
            fk=50.0, cent_0=d_start, cent_1=d_start + 6.0, T=3000.0,
            dtype=jnp.float64,
        )

        def force_fn_step(step_idx):
            def total(p, box):
                return total_energy(
                    p, ff, box=box, config=REFERENCE_CONFIG
                ) + bias.energy(p, step_idx)

            return lambda p, box: -jax.grad(total)(p, box)

        def step(s):
            fn = force_fn_step(s.step)
            return langevin_step(
                s, fn, ff.masses, dt_fs=1.0, T=300.0, gamma_ps=5.0
            )

        state = system_init(
            jnp.asarray(coords), key=jax.random.PRNGKey(2), dtype=jnp.float64
        )
        state = initialize_forces(state, force_fn_step(jnp.asarray(0)))

        @jax.jit
        def run(s, n):
            return jax.lax.fori_loop(0, n, lambda _, x: step(x), s)

        d0 = float(end_to_end_distance(state.pos, 0, 39))
        out = run(state, 3000)
        d1 = float(end_to_end_distance(out.pos, 0, 39))
        target = float(bias.center(out.step))
        assert bool(jnp.all(jnp.isfinite(out.pos)))
        assert d1 > d0 + 2.0  # visibly pulled outward
        assert abs(d1 - target) < 3.0  # tracking the schedule
