"""Sequence-model training: windowed LSTM / NLL / Seq2Seq / Transformer.

The reference's windowed prediction recipe (Molecule_Dynamics_v2/LSTM_V6):
composite position+phi+psi+kNN-distance loss on the next frame; the NLL
variants train the Gaussian head; Seq2Seq trains sequence L2 without teacher
forcing. One jitted step per family; the same step functions drive the
Transformer (any model with the (window) -> prediction signature).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import optax

from molecular_dynamics_tpu.train.losses import window_composite_loss
from molecular_dynamics_tpu.models.seq import gaussian_nll


@dataclasses.dataclass(frozen=True)
class SeqTrainConfig:
    lr: float = 1e-4
    clip_norm: float = 1.0
    n_atoms: int = 40
    w_pos: float = 1.0
    w_phi: float = 1.0
    w_psi: float = 1.0
    w_dist: float = 1.0
    knn_k: int = 5


def make_window_trainer(
    model,
    phi_idx,
    psi_idx,
    config: SeqTrainConfig = SeqTrainConfig(),
):
    """Composite-loss next-frame trainer (LSTM_V6/lstm.py:226)."""
    from molecular_dynamics_tpu.features import knn_mask

    opt = optax.chain(
        optax.clip_by_global_norm(config.clip_norm), optax.adam(config.lr)
    )
    knn = knn_mask(config.n_atoms, config.knn_k)
    phi_idx = jnp.asarray(phi_idx)
    psi_idx = jnp.asarray(psi_idx)

    @jax.jit
    def step(params, opt_state, window, target):
        def loss(p):
            pred = model.apply(p, window)
            return window_composite_loss(
                pred.reshape(-1, config.n_atoms, 3),
                target.reshape(-1, config.n_atoms, 3),
                phi_idx,
                psi_idx,
                knn,
                config.w_pos,
                config.w_phi,
                config.w_psi,
                config.w_dist,
            )

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def make_nll_trainer(model, lr: float = 1e-4, clip_norm: float = 1.0):
    """Gaussian-NLL next-frame trainer (LSTM_NLL_V1, TF1 'Alpha' line)."""
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    @jax.jit
    def step(params, opt_state, window, target):
        def loss(p):
            mu, sigma = model.apply(p, window)
            return gaussian_nll(mu, sigma, target)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def make_seq2seq_trainer(
    model, decode_len: int, lr: float = 1e-4, clip_norm: float = 1.0
):
    """Sequence L2 trainer, noise-fed decoder (Seq2Seq_V1/seq2seq.py)."""
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    @jax.jit
    def step(params, opt_state, key, window, target_seq):
        def loss(p):
            pred = model.apply(p, window, key, decode_len)
            return jnp.mean((pred - target_seq) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def autoregressive_rollout(model, params, window, n_steps: int):
    """Rollout driver: repeatedly predict the next frame and shift the
    window (the reference's test.py pattern, LSTM_V6/test.py:1-40)."""

    def body(w, _):
        pred = model.apply(params, w[None])[0]
        w = jnp.concatenate([w[1:], pred[None]], axis=0)
        return w, pred

    _, frames = jax.lax.scan(body, window, None, length=n_steps)
    return frames
