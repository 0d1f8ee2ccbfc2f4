"""Physics-informed conditional-GAN training (flagship training loop).

Re-design of the reference's canonical three-phase loop
(cGAN/pretrain-3.1.0_deriv-0.0.1/cgan.py:599-757 and GAN_V37/gan.py:543-696):

1. **G adversarial** — generator fools D on (t, features(G(z, t))),
2. **D** — BCE on real vs generated features,
3. **Informed** — generator minimizes the force-field potential of its
   structures plus a weighted SMD-bias term, backpropagating *through the
   energy stack* into the generator weights.

plus the **decoder pretrain** recipe (Pretrain_Backbone_RMSD_JV-3.0.4/
pretrain.py:404-553): potential + distance-matrix MSE + Kabsch RMSD with an
alpha curriculum that introduces the potential at ``v_intro_epoch``.

Every phase is one jitted update; the energy evaluations are vmapped over
the batch (the reference calls the Energy module once per sample per phase —
SURVEY.md §3.3 marks this as the hot loop).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from molecular_dynamics_tpu.energy import EnergyConfig, REFERENCE_CONFIG
from molecular_dynamics_tpu.ff.params import FFParams
from molecular_dynamics_tpu.models.cgan import Discriminator, Generator
from molecular_dynamics_tpu.train.losses import (
    bias_energy_loss,
    distance_matrix_loss,
    potential_loss,
    rmsd_loss,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class CGANConfig:
    latent_dim: int = 31
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    lr_informed: float = 1e-5
    clip_norm: float = 1.0  # reference clips at 1.0 (cgan.py:731)
    n_informed: int = 1  # informed updates per batch (Ni)
    w_potential: float = 1.0
    w_bias: float = 200.0  # reference's 200x E2End weight (cgan.py:712)
    feature: str = "positions"  # "positions" | "dihedrals"


def bce_logits(logits: Array, labels: Array) -> Array:
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits, labels)
    )


def make_cgan_trainer(
    generator: Generator,
    discriminator: Discriminator,
    ff: FFParams,
    bias=None,
    energy_config: EnergyConfig = REFERENCE_CONFIG,
    config: CGANConfig = CGANConfig(),
    feature_fn: Optional[Callable[[Array], Array]] = None,
    total_steps: float = 10000.0,
):
    """Build the jitted three-phase update functions.

    ``feature_fn`` maps a coordinate batch (B, N, 3) to discriminator
    features (defaults to flattened positions — the cGAN_D_pos line; pass a
    dihedral extractor for the D_phi line).

    Returns (init_fn, g_step, d_step, informed_step), each jit-compiled.
    ``total_steps`` converts normalized times t in [0,1] to bias step counts.
    """
    n_atoms = ff.n_atoms

    if feature_fn is None:
        feature_fn = lambda coords: coords.reshape(coords.shape[0], -1)

    def init_fn(key) -> Tuple[dict, dict]:
        kg, kd = jax.random.split(key)
        z = jnp.zeros((1, config.latent_dim))
        g_params = generator.init(kg, z, jnp.zeros((1,)))
        feats = feature_fn(jnp.zeros((1, n_atoms, 3)))
        d_params = discriminator.init(kd, feats, jnp.zeros((1,)))
        return g_params, d_params

    def optimizers():
        mk = lambda lr: optax.chain(
            optax.clip_by_global_norm(config.clip_norm), optax.adam(lr)
        )
        return mk(config.lr_g), mk(config.lr_d), mk(config.lr_informed)

    opt_g, opt_d, opt_i = optimizers()

    def _generate(g_params, key, t):
        z = jax.random.normal(key, (t.shape[0], config.latent_dim))
        return generator.apply(g_params, z, t, method=Generator.coords)

    @jax.jit
    def g_step(g_params, g_opt, d_params, key, t):
        """Adversarial generator update (cgan.py:609-636)."""

        def loss(gp):
            coords = _generate(gp, key, t)
            logits = discriminator.apply(d_params, feature_fn(coords), t)
            return bce_logits(logits, jnp.ones_like(logits))

        val, grads = jax.value_and_grad(loss)(g_params)
        updates, g_opt = opt_g.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt, val

    @jax.jit
    def d_step(d_params, d_opt, g_params, key, real_coords, t):
        """Discriminator update on real vs generated (cgan.py:638-686)."""

        def loss(dp):
            fake = _generate(g_params, key, t)
            logit_fake = discriminator.apply(dp, feature_fn(fake), t)
            logit_real = discriminator.apply(dp, feature_fn(real_coords), t)
            return bce_logits(
                logit_real, jnp.ones_like(logit_real)
            ) + bce_logits(logit_fake, jnp.zeros_like(logit_fake))

        val, grads = jax.value_and_grad(loss)(d_params)
        updates, d_opt = opt_d.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), d_opt, val

    @jax.jit
    def informed_step(g_params, i_opt, key, t):
        """Physics-informed update: batched potential + weighted bias
        through the differentiable energy stack (cgan.py:700-735)."""

        def loss(gp):
            coords = _generate(gp, key, t)
            e = potential_loss(coords, ff, config=energy_config)
            total = config.w_potential * e
            if bias is not None:
                steps = t * total_steps
                total = total + config.w_bias * bias_energy_loss(
                    coords, bias, steps
                )
            return total

        val, grads = jax.value_and_grad(loss)(g_params)
        updates, i_opt = opt_i.update(grads, i_opt, g_params)
        return optax.apply_updates(g_params, updates), i_opt, val

    return init_fn, (opt_g, opt_d, opt_i), g_step, d_step, informed_step


def make_pretrain_step(
    generator: Generator,
    ff: FFParams,
    energy_config: EnergyConfig = REFERENCE_CONFIG,
    latent_dim: int = 31,
    lr: float = 1e-4,
    clip_norm: float = 1.0,
    w_dist: float = 1.0,
    w_rmsd: float = 1.0,
):
    """Decoder pretraining step with alpha-curriculum potential weight.

    loss = alpha * mean potential + distance-matrix MSE + Kabsch RMSD
    (pretrain.py:486-553). ``alpha`` is an argument so the caller ramps it
    per epoch without recompiling.
    """
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    @jax.jit
    def step(g_params, opt_state, key, real_coords, t, alpha):
        def loss(gp):
            z = jax.random.normal(key, (t.shape[0], latent_dim))
            coords = generator.apply(gp, z, t, method=Generator.coords)
            l_pot = potential_loss(coords, ff, config=energy_config)
            l_dist = distance_matrix_loss(coords, real_coords)
            l_rmsd = rmsd_loss(coords, real_coords)
            return alpha * l_pot + w_dist * l_dist + w_rmsd * l_rmsd, (
                l_pot,
                l_dist,
                l_rmsd,
            )

        (val, parts), grads = jax.value_and_grad(loss, has_aux=True)(g_params)
        updates, opt_state = opt.update(grads, opt_state, g_params)
        return optax.apply_updates(g_params, updates), opt_state, val, parts

    return opt, step
