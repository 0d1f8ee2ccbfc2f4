"""Device-mesh sharding: replica ensembles and data-parallel training.

These tests need >= 2 devices; under the CPU test environment conftest
requests 8 virtual devices. On single-device environments they skip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu.parallel import (
    get_mesh,
    replicate_params,
    shard_batch,
    shard_ensemble,
)

multi_device = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >= 2 devices"
)


def test_get_mesh_rejects_oversubscription():
    with pytest.raises(ValueError):
        get_mesh(len(jax.devices()) + 1)


@multi_device
class TestSharding:
    def test_sharded_ensemble_step(self, backbone_system):
        from molecular_dynamics_tpu import (
            maxwell_boltzmann,
            system_init,
            total_energy,
        )
        from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.sim import (
            SimulationConfig,
            make_ensemble_step_fn,
        )
        from molecular_dynamics_tpu.system import replicate

        top, ff64, coords = backbone_system
        import jax.numpy as jnp
        from molecular_dynamics_tpu.examples import BACKBONE_FF_PRM
        from molecular_dynamics_tpu.ff import YamlForceField, build_ff_params

        ff = build_ff_params(top, YamlForceField(BACKBONE_FF_PRM))
        n_dev = min(len(jax.devices()), 8)
        mesh = get_mesh(n_dev)

        force = lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        )(p)
        state = system_init(
            jnp.asarray(coords, jnp.float32),
            vel=maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0),
        )
        state = initialize_forces(state, force)
        ens = replicate(state, 2 * n_dev, seed=1)
        sharded = shard_ensemble(ens, mesh)
        # leading axis is actually distributed
        shards = sharded.pos.sharding.device_set
        assert len(shards) == n_dev

        step = jax.jit(make_ensemble_step_fn(ff, SimulationConfig(dt_fs=0.5)))
        out = step(sharded)
        assert bool(jnp.all(jnp.isfinite(out.pos)))
        # parity with the unsharded step
        out_local = step(ens)
        np.testing.assert_allclose(
            np.asarray(out.pos), np.asarray(out_local.pos), atol=1e-6
        )

    def test_sharded_fused_campaign_matches_unsharded(self):
        """shard_map'ed fused campaign kernel == the single-launch kernel
        at T=0 (replicas are independent; the shard wrapper must be a pure
        re-batching). Runs the interpret-mode kernel on the CPU mesh."""
        from molecular_dynamics_tpu import (
            maxwell_boltzmann,
            minimize_fire,
            total_energy,
        )
        from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
        from molecular_dynamics_tpu.examples import decaalanine_full
        from molecular_dynamics_tpu.ops.fused_step import (
            make_fused_campaign_op,
        )
        from molecular_dynamics_tpu.parallel import shard_campaign_advance

        ff, coords, _ = decaalanine_full()
        n = ff.n_atoms
        pot = lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
        pos = jax.jit(
            lambda p: minimize_fire(
                p, lambda q: -jax.grad(pot)(q), n_steps=300,
                dt_start=1e-3, dt_max=1e-2,
            )
        )(jnp.asarray(coords, jnp.float32))
        n_dev = min(len(jax.devices()), 8)
        mesh = get_mesh(n_dev)
        R = 2 * n_dev
        adv = make_fused_campaign_op(
            ff, n_inner=2, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            block_r=2, interpret=True,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)

        p_ref, v_ref, _ = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)

        sharded = shard_campaign_advance(adv, mesh)
        pos_s = shard_ensemble(pos_b, mesh)
        vel_s = shard_ensemble(vel_b, mesh)
        f0_s = shard_ensemble(f0, mesh)
        p_s, v_s, _ = jax.jit(
            lambda a, b, c: sharded(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_s, vel_s, f0_s)
        assert len(p_s.sharding.device_set) == n_dev
        np.testing.assert_allclose(
            np.asarray(p_s), np.asarray(p_ref), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(v_s), np.asarray(v_ref), atol=1e-6
        )

    def test_data_parallel_grads_match_single_device(self, backbone_system):
        """DP informed-step gradients == single-device gradients (the psum
        inserted by jit's SPMD partitioner is exact)."""
        top, _, coords = backbone_system
        import jax.numpy as jnp
        from molecular_dynamics_tpu.examples import BACKBONE_FF_PRM
        from molecular_dynamics_tpu.ff import YamlForceField, build_ff_params
        from molecular_dynamics_tpu.models.cgan import Generator
        from molecular_dynamics_tpu.train.losses import potential_loss
        from molecular_dynamics_tpu.energy import REFERENCE_CONFIG

        ff = build_ff_params(top, YamlForceField(BACKBONE_FF_PRM))
        n_dev = min(len(jax.devices()), 8)
        mesh = get_mesh(n_dev, axis_name="dp")
        gen = Generator(n_atoms=40, hidden=(16,))
        z = jax.random.normal(jax.random.PRNGKey(0), (2 * n_dev, 31))
        t = jnp.linspace(0, 1, 2 * n_dev)
        params = gen.init(jax.random.PRNGKey(1), z, t)

        def loss(p, z, t):
            coords = gen.apply(p, z, t, method=Generator.coords)
            return potential_loss(coords, ff, config=REFERENCE_CONFIG)

        g_local = jax.jit(jax.grad(loss))(params, z, t)
        params_r = replicate_params(params, mesh)
        z_s = shard_batch(z, mesh, "dp")
        t_s = shard_batch(t, mesh, "dp")
        g_sharded = jax.jit(jax.grad(loss))(params_r, z_s, t_s)
        for a, b in zip(jax.tree.leaves(g_local), jax.tree.leaves(g_sharded)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestTrainingCLI:
    def test_run_training_with_devices(self, tmp_path):
        """mdx train --devices N end-to-end on a CPU mesh: DP-sharded
        batches + replicated params produce a finished run with finite
        eval metrics (VERDICT r2 #7)."""
        import json

        from molecular_dynamics_tpu.train.drivers import run_training

        rng = np.random.default_rng(0)
        from molecular_dynamics_tpu.examples import decaalanine_backbone

        top, coords = decaalanine_backbone()
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        for r in range(2):
            frames = np.asarray(coords)[None] + 0.3 * rng.standard_normal(
                (40, top.n_atoms, 3)
            ).astype(np.float32)
            np.save(data_dir / f"traj-{r}.npy", frames.astype(np.float32))

        n_dev = min(len(jax.devices()), 8)
        for family in ("pretrain", "lstm"):
            rc = run_training(
                family=family,
                data=str(data_dir / "*.npy"),
                epochs=1,
                batch_size=2 * n_dev,
                out_dir=str(tmp_path / "runs"),
                seed=0,
                devices=n_dev,
            )
            assert rc == 0
            with open(tmp_path / "runs" / family / "eval.json") as f:
                metrics = json.load(f)
            assert np.isfinite(metrics["mean_abs_error"])

    def test_run_training_devices_requires_divisible_batch(self, tmp_path):
        from molecular_dynamics_tpu.train.drivers import run_training

        with pytest.raises(ValueError, match="divisible"):
            run_training(
                family="lstm", data="", epochs=1, batch_size=3,
                out_dir=str(tmp_path / "runs"), devices=2,
            )
