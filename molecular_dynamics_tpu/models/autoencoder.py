"""Autoencoders: residual MLP AE, latent (Pixel) HNN support, adversarial AE.

Covers the remaining autoencoder family members (SURVEY.md §2.5, §2.11):

- ``MLPAutoencoder`` — the residual encoder/decoder pair
  (Hamiltonian/.../cuda_nn_models.py:52-87), also the backbone of the
  ``PixelHNN`` latent-dynamics variant (cuda_hnn.py:75-98): encode frames to
  a latent phase space, run an HNN there, decode.
- ``AdversarialAutoencoder`` — AE whose latent distribution is shaped by a
  discriminator (Molecule_Dynamics_v1/Adversarial_Autoencoder): the helper
  losses implement reconstruction + latent-adversarial training.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from molecular_dynamics_tpu.models.common import MLP


class MLPAutoencoder(nn.Module):
    """Residual MLP autoencoder (cuda_nn_models.py:52-87).

    ``cond_dim > 0`` makes the DECODER conditional (supervised-AAE style):
    ``decode(z, c)`` concatenates the conditioning vector — the aae family
    conditions on normalized reaction-coordinate time so prior sampling
    can sweep the pulling pathway like the cgan/vae lines do.
    """

    in_dim: int
    latent_dim: int
    hidden: Sequence[int] = (256, 128)
    cond_dim: int = 0

    def setup(self):
        self.encoder = MLP(
            tuple(self.hidden) + (self.latent_dim,), use_orthogonal_init=True
        )
        self.decoder = MLP(
            tuple(reversed(self.hidden)) + (self.in_dim,),
            use_orthogonal_init=True,
        )

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z, c=None):
        if self.cond_dim:
            z = jnp.concatenate([z, c], axis=-1)
        return self.decoder(z)

    def __call__(self, x, c=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z, c), z


class LatentHNN(nn.Module):
    """PixelHNN: autoencode to latent phase space, HNN dynamics there
    (cuda_hnn.py:75-98). ``latent_dim`` must be even (q, p split)."""

    in_dim: int
    latent_dim: int = 16
    ae_hidden: Sequence[int] = (256, 128)
    hnn_hidden: Sequence[int] = (200, 200)

    def setup(self):
        from molecular_dynamics_tpu.models.hnn import HNN

        self.ae = MLPAutoencoder(
            in_dim=self.in_dim, latent_dim=self.latent_dim,
            hidden=tuple(self.ae_hidden),
        )
        self.hnn = HNN(hidden=tuple(self.hnn_hidden))

    def __call__(self, x):
        recon, z = self.ae(x)
        fields = self.hnn(z)
        return recon, z, fields

    def encode(self, x):
        return self.ae.encode(x)

    def decode(self, z):
        return self.ae.decode(z)


class LatentDiscriminator(nn.Module):
    """Critic on latent codes for adversarial autoencoders."""

    hidden: Sequence[int] = (128, 64)

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = z
        for w in self.hidden:
            h = nn.leaky_relu(nn.Dense(w)(h), 0.2)
        return nn.Dense(1)(h)[..., 0]


def aae_losses(recon, x, d_logits_fake, d_logits_real=None):
    """(reconstruction MSE, generator-side BCE, discriminator BCE).

    Generator (encoder) fools the critic into reading its codes as prior
    samples; the critic separates prior samples from codes.
    """
    import optax

    rec = jnp.mean((recon - x) ** 2)
    g_adv = jnp.mean(
        optax.sigmoid_binary_cross_entropy(
            d_logits_fake, jnp.ones_like(d_logits_fake)
        )
    )
    if d_logits_real is None:
        return rec, g_adv, None
    d_loss = jnp.mean(
        optax.sigmoid_binary_cross_entropy(
            d_logits_real, jnp.ones_like(d_logits_real)
        )
    ) + jnp.mean(
        optax.sigmoid_binary_cross_entropy(
            d_logits_fake, jnp.zeros_like(d_logits_fake)
        )
    )
    return rec, g_adv, d_loss
