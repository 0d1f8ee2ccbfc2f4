"""Neural SDE-GAN training (Wasserstein + clipping + potential injection).

The reference recipe (TorchSDE/torchsde_v2/sde.py:399-478): generator
maximizes the critic on generated paths (gradient sign flip), critic weights
are clamped for the Lipschitz constraint, stochastic weight averaging tracks
both, Adadelta optimizes, and every ``potential_every`` steps the generator
additionally minimizes the force-field potential of its generated structures
through the differentiable energy stack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from molecular_dynamics_tpu.energy import EnergyConfig, REFERENCE_CONFIG
from molecular_dynamics_tpu.ff.params import FFParams
from molecular_dynamics_tpu.models.sde import CDEDiscriminator, SDEGenerator
from molecular_dynamics_tpu.train.losses import potential_loss


@dataclasses.dataclass(frozen=True)
class SDEGANConfig:
    lr_g: float = 2e-4
    lr_d: float = 1e-3
    weight_clip: float = 0.98  # critic clamp (sde.py:433)
    swa_decay: float = 0.99  # stochastic weight averaging
    potential_every: int = 10
    potential_weight: float = 1e-3


def make_sde_gan_trainer(
    generator: SDEGenerator,
    discriminator: CDEDiscriminator,
    ts: jnp.ndarray,
    ff: Optional[FFParams] = None,
    energy_config: EnergyConfig = REFERENCE_CONFIG,
    config: SDEGANConfig = SDEGANConfig(),
):
    """Returns (init_fn, opts, g_step, d_step, informed_step, swa_update)."""
    opt_g = optax.adadelta(config.lr_g)
    opt_d = optax.adadelta(config.lr_d)

    def init_fn(key, batch: int):
        kg, kd = jax.random.split(key)
        g_params = generator.init(kg, kg, ts, batch)
        fake = generator.apply(g_params, kg, ts, batch)
        d_params = discriminator.init(kd, fake, ts)
        return g_params, d_params

    @functools.partial(jax.jit, static_argnums=4)
    def g_step(g_params, g_opt, d_params, key, batch_size):
        def loss(gp):
            fake = generator.apply(gp, key, ts, batch_size)
            return -jnp.mean(discriminator.apply(d_params, fake, ts))

        val, grads = jax.value_and_grad(loss)(g_params)
        updates, g_opt = opt_g.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt, val

    @jax.jit
    def d_step(d_params, d_opt, g_params, key, real_paths):
        def loss(dp):
            fake = generator.apply(g_params, key, ts, real_paths.shape[0])
            return jnp.mean(discriminator.apply(dp, fake, ts)) - jnp.mean(
                discriminator.apply(dp, real_paths, ts)
            )

        val, grads = jax.value_and_grad(loss)(d_params)
        updates, d_opt = opt_d.update(grads, d_opt, d_params)
        new = optax.apply_updates(d_params, updates)
        clip = config.weight_clip
        new = jax.tree.map(lambda w: jnp.clip(w, -clip, clip), new)
        return new, d_opt, val

    @functools.partial(jax.jit, static_argnums=3)
    def informed_step(g_params, g_opt, key, batch_size):
        """Potential-loss injection through the energy stack
        (sde.py:437-478); paths decode to (B*T, N, 3) coordinates."""

        def loss(gp):
            fake = generator.apply(gp, key, ts, batch_size)
            coords = fake.reshape(-1, ff.n_atoms, 3)
            return config.potential_weight * potential_loss(
                coords, ff, config=energy_config
            )

        val, grads = jax.value_and_grad(loss)(g_params)
        updates, g_opt = opt_g.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt, val

    @jax.jit
    def swa_update(avg_params, params):
        d = config.swa_decay
        return jax.tree.map(lambda a, p: d * a + (1 - d) * p, avg_params, params)

    return init_fn, (opt_g, opt_d), g_step, d_step, informed_step, swa_update
