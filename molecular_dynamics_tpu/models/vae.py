"""Conditional VAE over trajectory frames.

Equivalent of the reference's time-conditioned VAE
(Autoencoder/autoencoder_v1/autoencoder.py:19-165): one-hot time-bucket
conditioning on both encoder and decoder, reparameterised sampling, MSE+KLD
objective, and a generation sweep over the buckets.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from molecular_dynamics_tpu.models.common import MLP


class ConditionalVAE(nn.Module):
    out_dim: int  # n_atoms * 3
    latent_dim: int = 32
    n_time_buckets: int = 10
    enc_hidden: Sequence[int] = (256, 128)
    dec_hidden: Sequence[int] = (128, 256)

    def setup(self):
        self.encoder = MLP(tuple(self.enc_hidden), final_activation=nn.relu)
        self.mu_head = nn.Dense(self.latent_dim)
        self.logvar_head = nn.Dense(self.latent_dim)
        self.decoder = MLP(tuple(self.dec_hidden) + (self.out_dim,))

    def _onehot(self, bucket, dtype):
        return jax.nn.one_hot(bucket, self.n_time_buckets, dtype=dtype)

    def encode(self, x, bucket):
        h = self.encoder(
            jnp.concatenate([x, self._onehot(bucket, x.dtype)], axis=-1)
        )
        return self.mu_head(h), self.logvar_head(h)

    def decode(self, z, bucket):
        return self.decoder(
            jnp.concatenate([z, self._onehot(bucket, z.dtype)], axis=-1)
        )

    def __call__(
        self, x: jnp.ndarray, bucket: jnp.ndarray, key
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (reconstruction, mu, logvar)."""
        mu, logvar = self.encode(x, bucket)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
            key, mu.shape, x.dtype
        )
        return self.decode(z, bucket), mu, logvar


def vae_loss(recon, x, mu, logvar, beta: float = 1.0):
    """MSE + beta * KLD (autoencoder.py:161-165)."""
    mse = jnp.sum((recon - x) ** 2, axis=-1)
    kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    return jnp.mean(mse + beta * kld)
