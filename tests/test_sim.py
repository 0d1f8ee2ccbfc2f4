"""Simulation-campaign layer: rollouts, ensembles, fused-kernel parity."""

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
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
from molecular_dynamics_tpu.integrate import initialize_forces
from molecular_dynamics_tpu.sim import (
    SimulationConfig,
    make_ensemble_step_fn,
    simulate,
    simulate_ensemble,
)
from molecular_dynamics_tpu.system import replicate


@pytest.fixture(scope="module")
def ready_state(backbone_system):
    top, ff64, coords = backbone_system
    import jax.numpy as jnp
    from molecular_dynamics_tpu.examples import BACKBONE_FF_PRM
    from molecular_dynamics_tpu.ff import YamlForceField, build_ff_params

    ff = build_ff_params(top, YamlForceField(BACKBONE_FF_PRM), dtype=jnp.float32)
    force = lambda p: -jax.grad(
        lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
    )(p)
    pos = jax.jit(
        lambda p: minimize_fire(p, force, n_steps=1500, dt_start=0.001, dt_max=0.01)
    )(jnp.asarray(coords, jnp.float32))
    key = jax.random.PRNGKey(0)
    state = system_init(pos, vel=maxwell_boltzmann(key, ff.masses, 300.0), key=key)
    state = initialize_forces(state, lambda p, b: force(p))
    return ff, state


class TestSimulate:
    def test_single_system_rollout_log(self, ready_state):
        ff, state = ready_state
        cfg = SimulationConfig(dt_fs=1.0)
        bias_d0 = float(jnp.linalg.norm(state.pos[39] - state.pos[0]))
        bias = HarmonicSMDBias.create(
            n_atoms=40, group1=[0], group2=[39], fk=1.0,
            cent_0=bias_d0, cent_1=bias_d0 + 2.0, T=1000.0,
        )
        final, frames, log = simulate(
            state, ff, n_steps=500, save_every=100, config=cfg, bias=bias
        )
        assert frames.shape == (5, 40, 3)
        for key in ("step", "epot", "ekin", "etot", "T",
                    "colvar_center", "colvar_value", "colvar_energy"):
            assert log[key].shape == (5,), key
        assert int(log["step"][-1]) == 500
        assert bool(jnp.all(jnp.isfinite(frames)))

    def test_ensemble_rollout(self, ready_state):
        ff, state = ready_state
        ens = replicate(state, 4, seed=7)
        final, frames, log = simulate_ensemble(
            ens, ff, n_steps=200, save_every=100,
            config=SimulationConfig(dt_fs=1.0),
        )
        assert frames.shape == (2, 4, 40, 3)
        assert log["T"].shape == (2, 4)
        # replicas decorrelated
        assert float(jnp.std(frames[-1], axis=0).mean()) > 1e-4

    def test_obs_stride(self, ready_state):
        """obs_every thins the log but not the frames, and leaves the
        trajectory itself bit-identical."""
        ff, state = ready_state
        ens = replicate(state, 4, seed=7)
        cfg = SimulationConfig(dt_fs=1.0)
        _, frames_1, log_1 = simulate_ensemble(
            ens, ff, n_steps=400, save_every=100, config=cfg
        )
        _, frames_2, log_2 = simulate_ensemble(
            ens, ff, n_steps=400, save_every=100, config=cfg, obs_every=2
        )
        assert frames_2.shape == (4, 4, 40, 3)
        assert log_2["T"].shape == (2, 4)
        np.testing.assert_array_equal(
            np.asarray(frames_1), np.asarray(frames_2)
        )
        # logged blocks line up with every 2nd save of the unstrided run
        np.testing.assert_allclose(
            np.asarray(log_1["T"])[1::2], np.asarray(log_2["T"]),
            rtol=1e-6,
        )
        with pytest.raises(ValueError, match="divisible"):
            simulate_ensemble(
                ens, ff, n_steps=300, save_every=100, config=cfg,
                obs_every=2,
            )


class TestFusedStepParity:
    def test_fused_matches_xla_step(self, ready_state):
        """One fused-kernel ensemble step == one XLA ensemble step
        (same PRNG path, interpret-mode kernel so it runs on any backend)."""
        ff, state = ready_state
        ens = replicate(state, 8, seed=3)

        cfg_x = SimulationConfig(dt_fs=1.0)
        step_x = jax.jit(make_ensemble_step_fn(ff, cfg_x))

        import molecular_dynamics_tpu.ops.nonbonded as nb
        import molecular_dynamics_tpu.ops.ring as ring_mod
        import molecular_dynamics_tpu.ops as ops_pkg

        orig = nb.make_nonbonded_op
        orig_ring = ring_mod.make_pair_ring_op
        try:
            nb_interpret = lambda *a, **k: orig(
                *a, **{**k, "interpret": True}
            )
            ring_interpret = lambda *a, **k: orig_ring(
                *a, **{**k, "interpret": True}
            )
            nb.make_nonbonded_op = nb_interpret
            ops_pkg.make_nonbonded_op = nb_interpret
            ring_mod.make_pair_ring_op = ring_interpret
            cfg_f = SimulationConfig(dt_fs=1.0, fused_nonbonded=True)
            step_f = jax.jit(make_ensemble_step_fn(ff, cfg_f))
            out_x = step_x(ens)
            out_f = step_f(ens)
        finally:
            nb.make_nonbonded_op = orig
            ops_pkg.make_nonbonded_op = orig
            ring_mod.make_pair_ring_op = orig_ring

        # fused forces differ from XLA by kernel f32 + bf16x3 bond-vector
        # extraction: ~1e-4 relative (|F| up to ~300 kcal/mol/A here)
        np.testing.assert_allclose(
            np.asarray(out_f.pos), np.asarray(out_x.pos), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_f.forces), np.asarray(out_x.forces), atol=0.15
        )


class TestNonbondedKernelParity:
    def test_energy_force_parity_interpret(self, rng):
        """Kernel (interpret mode) vs XLA reference on the 104-atom system."""
        import jax.numpy as jnp
        from molecular_dynamics_tpu.examples import decaalanine_full
        from molecular_dynamics_tpu.ops import make_nonbonded_op

        ff, coords, _ = decaalanine_full()
        op = make_nonbonded_op(ff, interpret=True)
        pos = jnp.asarray(
            np.stack([coords + rng.normal(0, 0.05, coords.shape) for _ in range(8)]),
            jnp.float32,
        )
        e_k, f_k = jax.jit(op)(pos)
        e_r = jax.jit(op.reference_energy)(pos)
        f_r = jax.jit(op.reference_forces)(pos)
        np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_r), atol=2e-3)
        np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r), atol=1e-3)

    def test_custom_vjp_matches_reference_grad(self, rng):
        from molecular_dynamics_tpu.examples import decaalanine_full
        from molecular_dynamics_tpu.ops import make_nonbonded_op

        ff, coords, _ = decaalanine_full()
        op = make_nonbonded_op(ff, interpret=True)
        pos = jnp.asarray(coords[None] + 0.0, jnp.float32)
        g1 = jax.jit(jax.grad(lambda p: jnp.sum(op(p)[0])))(pos)
        g2 = jax.jit(jax.grad(lambda p: jnp.sum(op.reference_energy(p))))(pos)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_ring_kernel_matches_dense(self, rng):
        """Ring-shift pairing == dense symmetric matrix (each pair once)."""
        from molecular_dynamics_tpu.examples import decaalanine_full
        from molecular_dynamics_tpu.ops import make_nonbonded_op
        from molecular_dynamics_tpu.ops.ring import make_pair_ring_op

        ff, coords, _ = decaalanine_full()
        dense = make_nonbonded_op(ff, interpret=True)
        ring = make_pair_ring_op(ff, interpret=True, block_r=8)
        pos = jnp.asarray(
            np.stack([coords + rng.normal(0, 0.05, coords.shape) for _ in range(8)]),
            jnp.float32,
        )
        e_d, f_d = jax.jit(dense)(pos)
        e_r, f_r = jax.jit(ring)(pos)
        # f32 summation-order differences only (the old 0.1/0.05 bounds hid
        # a halfway-row double-halving bug worth 0.04 kcal/mol at cutoff 9)
        np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_d), atol=0.01)
        np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_d), atol=0.005)

    def test_ring_chunked_matches_mono(self, rng):
        """Grid-chunked shift loop == monolithic kernel (the large-system
        compile-time tier: fixed 64-shift body + dynamic start/final rolls
        + output accumulation over chunk grid cells must telescope to the
        identical pair sum). Forced shift_chunk=16 on the 104-atom system
        exercises 4 chunks against the mono kernel; tiled 208 atoms
        exercises the auto-chunked (n_shifts=128 -> 2x64) path against
        the dense XLA reference."""
        from molecular_dynamics_tpu.examples import decaalanine_full, tiled_decaalanine
        from molecular_dynamics_tpu.ops.ring import make_pair_ring_op

        ff, coords, _ = decaalanine_full()
        mono = make_pair_ring_op(ff, interpret=True, block_r=8)
        chunked = make_pair_ring_op(
            ff, interpret=True, block_r=8, shift_chunk=16
        )
        pos = jnp.asarray(
            np.stack([coords + rng.normal(0, 0.05, coords.shape)
                      for _ in range(4)]),
            jnp.float32,
        )
        e_m, f_m = jax.jit(mono)(pos)
        e_c, f_c = jax.jit(chunked)(pos)
        np.testing.assert_allclose(np.asarray(e_c), np.asarray(e_m), atol=0.01)
        np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_m), atol=0.005)

        ff2, c2, _ = tiled_decaalanine(2)
        ring2 = make_pair_ring_op(ff2, interpret=True, block_r=8)
        pos2 = jnp.asarray(c2, jnp.float32)[None]
        e_r, f_r = jax.jit(ring2)(pos2)
        e_ref = ring2.reference_energy(pos2)
        f_ref = ring2.reference_forces(pos2)
        np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_ref), atol=0.02)
        np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_ref), atol=0.01)

    def test_ring_kernel_matches_dense_wide_cutoff(self):
        """Regression: at cutoff 16 (the GBIS protocol) the halfway-shift
        row (pairs i, i+64) is inside the cutoff — its contribution must be
        halved exactly once (a double-halving bug dropped 15.9 kcal/mol of
        elec+LJ here and was invisible at cutoff 9, where those pairs are
        out of range)."""
        from molecular_dynamics_tpu.examples import decaalanine_full
        from molecular_dynamics_tpu.ops import make_nonbonded_op
        from molecular_dynamics_tpu.ops.ring import make_pair_ring_op

        ff, coords, _ = decaalanine_full()
        kw = dict(cutoff=16.0, switch_dist=15.0, rfa=False,
                  solvent_dielectric=80.0, interpret=True)
        dense = make_nonbonded_op(ff, **kw)
        ring = make_pair_ring_op(ff, block_r=8, **kw)
        pos = jnp.asarray(coords, jnp.float32)[None]
        e_d, f_d = jax.jit(dense)(pos)
        e_r, f_r = jax.jit(ring)(pos)
        np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_d), atol=1e-3)
        np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_d), atol=1e-3)
