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
