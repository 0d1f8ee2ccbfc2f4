"""Trainers for the flow / VAE / HNN-free generative families.

- ``make_flow_trainer`` — conditional-NLL RealNVP training
  (cFlow/cFlow_1.0.0/cflow.py:467-485)
- ``make_vae_trainer`` — MSE+KLD conditional VAE training
  (Autoencoder/autoencoder_v1/autoencoder.py:150-176)
Both one jitted step; generation sweeps live on the models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from molecular_dynamics_tpu.models.flows import RealNVP
from molecular_dynamics_tpu.models.vae import ConditionalVAE, vae_loss


def make_flow_trainer(model: RealNVP, lr: float = 1e-4, clip_norm: float = 1.0):
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    @jax.jit
    def step(params, opt_state, x, cond):
        def loss(p):
            return -jnp.mean(model.apply(p, x, cond))

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def make_vae_trainer(
    model: ConditionalVAE, lr: float = 1e-4, beta: float = 1.0,
    clip_norm: float = 1.0,
):
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    @jax.jit
    def step(params, opt_state, key, x, bucket):
        def loss(p):
            recon, mu, logvar = model.apply(p, x, bucket, key)
            return vae_loss(recon, x, mu, logvar, beta)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step
