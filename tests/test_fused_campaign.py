"""Fully-fused campaign kernel: parity with the composed step (T=0 path).

The noisy (T>0) path needs the on-core TPU PRNG and is validated on real
hardware (thermostat + bench); here the deterministic T=0 kernel runs in
interpreter mode on any backend and is checked against the same BAOAB step
composed from the XLA force path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu import (
    HarmonicSMDBias,
    maxwell_boltzmann,
    minimize_fire,
    system_init,
    total_energy,
)
from molecular_dynamics_tpu import units
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
from molecular_dynamics_tpu.ops.fused_step import make_fused_campaign_op


@pytest.fixture(scope="module")
def full_system():
    from molecular_dynamics_tpu.examples import decaalanine_full

    ff, coords, _ = decaalanine_full()
    force = lambda p: -jax.grad(
        lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
    )(p)
    pos = jax.jit(
        lambda p: minimize_fire(p, force, n_steps=500, dt_start=1e-3, dt_max=1e-2)
    )(jnp.asarray(coords, jnp.float32))
    return ff, pos


class TestFusedCampaign:
    def test_single_step_matches_composed(self, full_system):
        ff, pos = full_system
        n = ff.n_atoms
        d0 = float(jnp.linalg.norm(pos[-1] - pos[0]))
        bias = HarmonicSMDBias.create(
            n_atoms=n, group1=[0], group2=[n - 1], fk=1.0,
            cent_0=d0, cent_1=d0 + 22.0, T=500_000.0,
        )
        adv = make_fused_campaign_op(
            ff, n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            bias=bias, block_r=8, interpret=True,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        R = 4
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        pot = lambda q: total_energy(
            q, ff, config=REFERENCE_CONFIG
        ) + bias.energy(q, 0)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        p1, v1, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)

        # composed reference: damped BAOAB at T=0 through the XLA force path
        dt = 1.0 / units.TIMEFACTOR
        gamma = 1.0 * (units.TIMEFACTOR / 1000.0)
        c1 = float(np.exp(-gamma * dt))
        m = jnp.asarray(ff.masses, jnp.float32)[:, None]
        vv = vel_b + 0.5 * dt * f0 / m
        xx = pos_b + 0.5 * dt * vv
        vv = c1 * vv
        xx = xx + 0.5 * dt * vv
        f_new = jax.vmap(lambda p: -jax.grad(pot)(p))(xx)
        vv = vv + 0.5 * dt * f_new / m

        np.testing.assert_allclose(np.asarray(p1), np.asarray(xx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(vv), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(f1), np.asarray(f_new), atol=0.15
        )

    def test_constrained_step_matches_composed(self, full_system):
        """In-kernel SHAKE/RATTLE vs constrained_langevin_step (T=0).

        Same sweep counts on both sides -> the Jacobi fixed-point iterates
        are identical up to f32 op order.
        """
        from molecular_dynamics_tpu.constraints import (
            constrained_langevin_step,
            hydrogen_bond_constraints,
        )
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.system import replicate, system_init

        ff, pos = full_system
        n = ff.n_atoms
        cons = hydrogen_bond_constraints(ff)
        assert cons.n_constraints > 0
        adv = make_fused_campaign_op(
            ff, n_inner=2, dt_fs=2.0, temperature=0.0, gamma_ps=1.0,
            block_r=8, interpret=True,
            constraints=cons, shake_iters=30, rattle_iters=15,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        pot = lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        force = lambda p, b: -jax.grad(pot)(p)
        R = 4
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        p1, v1, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)

        state = system_init(pos.astype(jnp.float32), key=jax.random.PRNGKey(2))
        state = state.replace(vel=vel.astype(jnp.float32))
        state = initialize_forces(state, force)
        ens = replicate(state, R, seed=0)
        ens = ens.replace(
            pos=pos_b, vel=vel_b, forces=f0, key=ens.key
        )
        step = jax.jit(
            jax.vmap(
                lambda s: constrained_langevin_step(
                    s, force, ff.masses, cons, dt_fs=2.0, T=0.0,
                    gamma_ps=1.0, n_iter=30,
                )
            )
        )
        ref = step(step(ens))

        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(ref.pos), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(ref.vel), atol=5e-3
        )

        # constraint violations after the step: well under 1e-5 A
        i, j = np.asarray(cons.pairs).T
        d = np.linalg.norm(np.asarray(p1)[:, i] - np.asarray(p1)[:, j], axis=-1)
        viol = np.abs(d - np.asarray(cons.lengths)[None, :])
        assert viol.max() < 1e-5, f"max violation {viol.max():.2e} A"

    def test_constrained_default_sweeps_converge(self, full_system):
        """Default sweep counts (shake 6 / rattle 3) keep violations < 1e-6 A."""
        from molecular_dynamics_tpu.constraints import (
            hydrogen_bond_constraints,
        )

        ff, pos = full_system
        n = ff.n_atoms
        cons = hydrogen_bond_constraints(ff)
        adv = make_fused_campaign_op(
            ff, n_inner=5, dt_fs=2.0, temperature=0.0, gamma_ps=1.0,
            block_r=8, interpret=True, constraints=cons,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        pot = lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        R = 4
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        p1, v1, _ = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)
        i, j = np.asarray(cons.pairs).T
        d = np.linalg.norm(np.asarray(p1)[:, i] - np.asarray(p1)[:, j], axis=-1)
        viol = np.abs(d - np.asarray(cons.lengths)[None, :])
        assert viol.max() < 1e-6, f"max violation {viol.max():.2e} A"
        # RATTLE: along-bond relative velocity is projected out. Three
        # Jacobi sweeps at contraction ~0.08 leave ~5e-4 of the thermal
        # along-bond velocity (~5e-2) -> bound at 5e-5, far below thermal.
        dhat = (np.asarray(p1)[:, i] - np.asarray(p1)[:, j]) / d[..., None]
        vrel = np.sum(
            (np.asarray(v1)[:, i] - np.asarray(v1)[:, j]) * dhat, axis=-1
        )
        assert np.abs(vrel).max() < 5e-5

    @pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="on-core PRNG (pltpu.prng_random_bits) needs a real TPU",
    )
    def test_campaign_noise_independence(self, full_system):
        """Thermostat noise: replicas within and across kernel blocks get
        independent streams; seeds are reproducible and distinct."""
        ff, pos = full_system
        n = ff.n_atoms
        adv = make_fused_campaign_op(
            ff, n_inner=5, dt_fs=1.0, temperature=300.0, gamma_ps=1.0,
            block_r=8,
        )
        R = 16  # two grid blocks of 8
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.zeros((R, n, 3), jnp.float32)
        pot = lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        run = jax.jit(lambda s: adv(pos_b, vel_b, f0, jnp.int32(0), s))
        p1, v1, _ = run(jnp.int32(123))
        flat = np.asarray(p1).reshape(R, -1)
        # identical initial replicas diverge pairwise (independent noise),
        # including across the block boundary (rows 7 vs 8)
        for a in range(R):
            for b in range(a + 1, R):
                assert np.abs(flat[a] - flat[b]).max() > 1e-6, (a, b)
        # different seed -> different trajectories; same seed -> identical
        p2, _, _ = run(jnp.int32(124))
        assert np.abs(np.asarray(p1) - np.asarray(p2)).max() > 1e-6
        p3, _, _ = run(jnp.int32(123))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p3))

    def test_simulate_ensemble_campaign_path(self, full_system):
        """simulate_ensemble with fused_campaign=True (interpret, T=0)."""
        import dataclasses as _dc

        import molecular_dynamics_tpu.ops.fused_step as fs
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.sim import SimulationConfig, simulate_ensemble
        from molecular_dynamics_tpu.system import replicate

        ff, pos = full_system
        n = ff.n_atoms
        force = lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        )(p)
        state = system_init(pos, key=jax.random.PRNGKey(1))
        state = initialize_forces(state, force)
        ens = replicate(state, 4, seed=3)

        orig = fs.make_fused_campaign_op
        try:
            fs.make_fused_campaign_op = lambda *a, **k: orig(
                *a, **{**k, "interpret": True, "block_r": 8}
            )
            cfg = SimulationConfig(
                dt_fs=0.5, temperature=0.0, fused_campaign=True
            )
            final, frames, log = simulate_ensemble(
                ens, ff, n_steps=20, save_every=10, config=cfg
            )
        finally:
            fs.make_fused_campaign_op = orig

        assert frames.shape == (2, 4, n, 3)
        assert int(final.step[0]) == 20
        assert bool(jnp.all(jnp.isfinite(frames)))
        assert log["T"].shape == (2, 4)

    def test_simulate_ensemble_save_forces(self, full_system):
        """save_forces=True records per-atom forces per saved frame (the
        reference's tclForces force-dump campaign,
        SMD_with_Forces/gendirs_GBIS_tcl-forces.py:90-122); the trajectory
        is bit-identical with and without the extra output, and the last
        force frame equals the final state's forces."""
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.sim import (
            SimulationConfig,
            simulate_ensemble,
        )
        from molecular_dynamics_tpu.system import replicate

        ff, pos = full_system
        n = ff.n_atoms
        force = lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        )(p)
        state = system_init(pos, key=jax.random.PRNGKey(1))
        state = initialize_forces(state, force)
        ens = replicate(state, 2, seed=3)

        cfg = SimulationConfig(
            dt_fs=0.5, temperature=0.0, fused_campaign=False
        )
        final, frames, log = simulate_ensemble(
            ens, ff, n_steps=20, save_every=10, config=cfg
        )
        final_f, frames_f, log_f, forces_f = simulate_ensemble(
            ens, ff, n_steps=20, save_every=10, config=cfg,
            save_forces=True,
        )
        assert forces_f.shape == (2, 2, n, 3)
        assert bool(jnp.all(jnp.isfinite(forces_f)))
        np.testing.assert_array_equal(
            np.asarray(frames_f), np.asarray(frames)
        )
        np.testing.assert_array_equal(
            np.asarray(forces_f[-1]), np.asarray(final_f.forces)
        )

    def test_simulate_ensemble_campaign_constrained(self, full_system):
        """fused_campaign + constrain_h_bonds runs the in-kernel SHAKE path
        (the flagship NAMD protocol: rigidBonds all at 2 fs)."""
        import molecular_dynamics_tpu.ops.fused_step as fs
        from molecular_dynamics_tpu.constraints import (
            hydrogen_bond_constraints,
        )
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.sim import SimulationConfig, simulate_ensemble
        from molecular_dynamics_tpu.system import replicate

        ff, pos = full_system
        n = ff.n_atoms
        force = lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        )(p)
        state = system_init(pos, key=jax.random.PRNGKey(1))
        state = initialize_forces(state, force)
        ens = replicate(state, 4, seed=3)

        seen = {}
        orig = fs.make_fused_campaign_op

        def spy(*a, **k):
            seen["constraints"] = k.get("constraints")
            return orig(*a, **{**k, "interpret": True, "block_r": 8})

        try:
            fs.make_fused_campaign_op = spy
            cfg = SimulationConfig(
                dt_fs=2.0, temperature=0.0, fused_campaign=True,
                constrain_h_bonds=True,
            )
            final, frames, log = simulate_ensemble(
                ens, ff, n_steps=20, save_every=10, config=cfg
            )
        finally:
            fs.make_fused_campaign_op = orig

        assert seen["constraints"] is not None  # kernel path, not fallback
        cons = hydrogen_bond_constraints(ff)
        i, j = np.asarray(cons.pairs).T
        p_last = np.asarray(frames[-1])
        d = np.linalg.norm(p_last[:, i] - p_last[:, j], axis=-1)
        viol = np.abs(d - np.asarray(cons.lengths)[None, :])
        assert viol.max() < 1e-5
        assert bool(jnp.all(jnp.isfinite(frames)))


class TestMultiStepStochasticParity:
    def test_thermostatted_distributional_parity(self, full_system):
        """VERDICT r2 #8: a thermostatted multi-step campaign driven by the
        fused kernel must match the composed XLA path *distributionally*
        (mean temperature, radius of gyration, end-to-end distance over the
        equilibrated half), so kernel drift bugs cannot hide behind
        single-step/T=0 parity. Different PRNG streams by construction —
        the comparison is statistical, with tolerances ~3x the standard
        error of each mean."""
        import dataclasses

        from molecular_dynamics_tpu import maxwell_boltzmann, system_init
        from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.sim import (
            SimulationConfig,
            simulate_ensemble,
        )
        from molecular_dynamics_tpu.system import replicate

        ff, pos = full_system
        n = ff.n_atoms
        key = jax.random.PRNGKey(0)
        state = system_init(
            pos, vel=maxwell_boltzmann(key, ff.masses, 300.0), key=key
        )
        pot = lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        state = initialize_forces(
            state, lambda p, b: -jax.grad(pot)(p)
        )
        ens = replicate(state, 8, seed=3)

        def run(fused: bool, seed: int):
            cfg = SimulationConfig(
                dt_fs=2.0, temperature=300.0, gamma_ps=1.0,
                fused_campaign=fused, constrain_h_bonds=True,
            )
            e = replicate(state, 8, seed=seed)
            _, frames, log = simulate_ensemble(
                e, ff, n_steps=3000, save_every=100, config=cfg
            )
            half = np.asarray(frames)[15:]  # equilibrated half
            t_half = np.asarray(log["T"])[15:]
            cen = half - half.mean(axis=2, keepdims=True)
            rg = np.sqrt((cen**2).sum(axis=(2, 3)) / n)
            e2e = np.linalg.norm(half[:, :, -1] - half[:, :, 0], axis=-1)
            return (
                float(t_half.mean()), float(rg.mean()), float(e2e.mean())
            )

        t_k, rg_k, e2e_k = run(fused=True, seed=3)
        t_c, rg_c, e2e_c = run(fused=False, seed=4)
        assert abs(t_k - t_c) < 12.0, (t_k, t_c)
        assert abs(rg_k - rg_c) < 0.4, (rg_k, rg_c)
        assert abs(e2e_k - e2e_c) < 1.5, (e2e_k, e2e_c)
