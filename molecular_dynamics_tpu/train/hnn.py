"""HNN training: derivative regression + potential-regularized steps.

The reference's recipe (Hamiltonian/Mol-HNN-cuda-v4.2/HNN-Full.py:216-272):
nine of ten steps are plain L2 on the predicted phase-space derivative; every
tenth step adds the force-field potential of the *advanced* structure
(x + dx_hat), with per-term weights, backpropagated through the energy stack.
The GAT-HNN-R variant adds a recurrent unroll: advance ``seq_len`` steps
autoregressively and L2 against the dx sequence (GAT-HNN-R-v2/
train-HNN.py:167-186).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from molecular_dynamics_tpu.energy import EnergyConfig, REFERENCE_CONFIG
from molecular_dynamics_tpu.ff.params import FFParams
from molecular_dynamics_tpu.models.hnn import HNN, time_derivative
from molecular_dynamics_tpu.train.losses import potential_loss

Array = jnp.ndarray

#: the reference's potential term weights (HNN-Full.py:236-258 factors)
DEFAULT_TERM_WEIGHTS = {
    "bonds": 1.0,
    "angles": 1.0,
    "dihedrals": 1.0,
    "impropers": 1.0,
    "lj": 1.0,
    "electrostatics": 1.0,
}


@dataclasses.dataclass(frozen=True)
class HNNTrainConfig:
    lr: float = 1e-3
    clip_norm: float = 1.0
    potential_every: int = 10  # every 10th step adds the energy term
    potential_weight: float = 1e-3
    dt: float = 0.005  # rollout integration factor (HNN-Full.py:299)
    seq_len: int = 1  # >1 enables the GAT-HNN-R recurrent unroll


def make_hnn_trainer(
    model: HNN,
    ff: Optional[FFParams] = None,
    energy_config: EnergyConfig = REFERENCE_CONFIG,
    config: HNNTrainConfig = HNNTrainConfig(),
    term_weights: Optional[Dict[str, float]] = None,
):
    """Returns (opt, l2_step, informed_step, unroll_step), all jitted.

    ``x``/``dx`` batches are phase-space rows (B, 2*N*3); the informed step
    needs ``ff`` to score x + dx_hat through the force field.
    """
    opt = optax.chain(
        optax.clip_by_global_norm(config.clip_norm), optax.adam(config.lr)
    )
    weights = term_weights or DEFAULT_TERM_WEIGHTS

    @jax.jit
    def l2_step(params, opt_state, x, dx):
        def loss(p):
            return jnp.mean((time_derivative(model, p, x) - dx) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    def _advanced_coords(p, x):
        """x + dx_hat, position half reshaped to (B, N, 3)."""
        new_x = x + time_derivative(model, p, x)
        half = new_x.shape[-1] // 2
        return new_x[..., :half].reshape(x.shape[0], -1, 3)

    @jax.jit
    def informed_step(params, opt_state, x, dx):
        """L2 + weighted potential of the advanced structure
        (HNN-Full.py:220-258), backprop through the energy stack."""

        def loss(p):
            l2 = jnp.mean((time_derivative(model, p, x) - dx) ** 2)
            coords = _advanced_coords(p, x)
            pot = potential_loss(
                coords, ff, config=energy_config, term_weights=weights
            )
            return l2 + config.potential_weight * pot, (l2, pot)

        (val, parts), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val, parts

    @jax.jit
    def unroll_step(params, opt_state, x0, dx_seq):
        """Recurrent rollout training: advance seq_len steps
        autoregressively, L2 against the dx sequence
        (GAT-HNN-R-v2/train-HNN.py:177-186)."""

        def loss(p):
            def body(x, dx_target):
                dx_hat = time_derivative(model, p, x)
                return x + dx_hat, jnp.mean((dx_hat - dx_target) ** 2)

            _, losses = jax.lax.scan(
                body, x0, jnp.moveaxis(dx_seq, 1, 0)
            )
            return jnp.mean(losses)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, l2_step, informed_step, unroll_step
