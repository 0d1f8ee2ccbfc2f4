"""Sequence predictors: windowed LSTM, Gaussian-NLL LSTM, Seq2Seq.

Covers the reference families in SURVEY.md §2.11:

- ``LSTMPredictor`` — history-window -> next-frame regression
  (Molecule_Dynamics_v2/LSTM_V6/lstm.py: history 15, lead 2), trained with
  the composite geometric loss in ``mdx.train.losses``.
- ``LSTMNLLPredictor`` — mu/sigma head with constrained-Gaussian NLL
  (LSTM_NLL_V1/LSTMNLL_Train.py:89,161; also the TF1 "Alpha" line).
- ``Seq2Seq`` — LSTM encoder into a noise-fed LSTM decoder generating a
  frame sequence without teacher forcing
  (Molecule_Dynamics_v3/Seq2Seq_V1/seq2seq.py:65-98).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class LSTMPredictor(nn.Module):
    """(batch, history, features) -> (batch, features) next-frame head."""

    out_dim: int
    hidden_size: int = 256
    n_layers: int = 1

    @nn.compact
    def __call__(self, window: jnp.ndarray) -> jnp.ndarray:
        x = window.astype(jnp.float32)  # model compute dtype (TPU-native f32)
        for _ in range(self.n_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size))(x)
        return nn.Dense(self.out_dim)(x[..., -1, :])


class LSTMNLLPredictor(nn.Module):
    """Next-frame Gaussian: returns (mu, sigma) with positive sigma."""

    out_dim: int
    hidden_size: int = 256
    min_sigma: float = 1e-3

    @nn.compact
    def __call__(self, window: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        window = window.astype(jnp.float32)
        h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size))(window)[..., -1, :]
        mu = nn.Dense(self.out_dim)(h)
        sigma = nn.softplus(nn.Dense(self.out_dim)(h)) + self.min_sigma
        return mu, sigma


def gaussian_nll(mu, sigma, target):
    """Constrained-Gaussian negative log likelihood (LSTMNLL_Train.py:89)."""
    var = sigma**2
    return jnp.mean(
        0.5 * jnp.log(2 * jnp.pi * var) + 0.5 * (target - mu) ** 2 / var
    )


class SequenceDiscriminator(nn.Module):
    """LSTM critic over a rolled-out trajectory — the adversarial Seq2Seq
    variant's discriminator (Molecule_Dynamics_v1/Seq2Seq_Position_GAN_V1/
    lstm.py:99-237): consumes (batch, T, features), scores the sequence."""

    hidden_size: int = 128

    @nn.compact
    def __call__(self, seq: jnp.ndarray) -> jnp.ndarray:
        seq = seq.astype(jnp.float32)
        h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size))(seq)[..., -1, :]
        return nn.Dense(1)(h)[..., 0]


class Seq2Seq(nn.Module):
    """Encode a history window; decode a future sequence fed by noise.

    The decoder consumes a noise vector per output step (no teacher
    forcing), mirroring seq2seq.py:65-98; ``decode_len`` output frames.
    """

    out_dim: int
    hidden_size: int = 256
    noise_dim: int = 16

    @nn.compact
    def __call__(
        self, window: jnp.ndarray, key, decode_len: int
    ) -> jnp.ndarray:
        window = window.astype(jnp.float32)
        enc_cell = nn.OptimizedLSTMCell(self.hidden_size)
        dec_cell = nn.OptimizedLSTMCell(self.hidden_size)
        head = nn.Dense(self.out_dim)

        batch_shape = window.shape[:-2]
        carry = enc_cell.initialize_carry(
            jax.random.PRNGKey(0), batch_shape + (window.shape[-1],)
        )
        for i in range(window.shape[-2]):
            carry, _ = enc_cell(carry, window[..., i, :])

        noise = jax.random.normal(
            key, batch_shape + (decode_len, self.noise_dim), window.dtype
        )
        outs = []
        for i in range(decode_len):
            carry, h = dec_cell(carry, noise[..., i, :])
            outs.append(head(h))
        return jnp.stack(outs, axis=-2)


class Seq2SeqNLL(nn.Module):
    """Seq2Seq with a Gaussian (mu, sigma) head per decoded step —
    the Seq2Seq_NLL_V1 variant (Molecule_Dynamics_v2/Seq2Seq_NLL.py)."""

    out_dim: int
    hidden_size: int = 256
    noise_dim: int = 16
    min_sigma: float = 1e-3

    @nn.compact
    def __call__(self, window, key, decode_len: int):
        window = window.astype(jnp.float32)
        enc_cell = nn.OptimizedLSTMCell(self.hidden_size)
        dec_cell = nn.OptimizedLSTMCell(self.hidden_size)
        mu_head = nn.Dense(self.out_dim)
        sigma_head = nn.Dense(self.out_dim)

        batch_shape = window.shape[:-2]
        carry = enc_cell.initialize_carry(
            jax.random.PRNGKey(0), batch_shape + (window.shape[-1],)
        )
        for i in range(window.shape[-2]):
            carry, _ = enc_cell(carry, window[..., i, :])
        noise = jax.random.normal(
            key, batch_shape + (decode_len, self.noise_dim), jnp.float32
        )
        mus, sigmas = [], []
        for i in range(decode_len):
            carry, h = dec_cell(carry, noise[..., i, :])
            mus.append(mu_head(h))
            sigmas.append(nn.softplus(sigma_head(h)) + self.min_sigma)
        return jnp.stack(mus, axis=-2), jnp.stack(sigmas, axis=-2)
