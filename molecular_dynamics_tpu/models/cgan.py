"""Time-conditioned GAN for reaction-pathway structure generation.

The flagship family (SURVEY.md §2.6-2.7): a generator mapping
(noise z, normalized reaction-coordinate time t) -> coordinates, and a
discriminator scoring (t, features) pairs, where features are raw positions
(cGAN_D_pos line), dihedral angles (GAN_V27+/cGAN_D_phi line) or distance
matrices (GAN_V19.3). Architectures follow the canonical MLP shapes
(GAN_V17.12/gan.py:93-146, 31-dim z; cGAN/pretrain-3.1.0 cgan.py decoder),
with everything batched — the physics-informed ("informed") update evaluates
the force-field energy of generated structures through ``jax.vmap`` over the
batch instead of the reference's per-sample Energy calls
(GAN_V37/gan.py:649-667).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


def _conform_time(t, ref: jnp.ndarray) -> jnp.ndarray:
    """Broadcast scalar or per-sample t to ``ref.shape[:-1] + (1,)``."""
    t = jnp.asarray(t, ref.dtype)
    if t.ndim == ref.ndim - 1 and t.ndim > 0:
        t = t[..., None]
    return jnp.broadcast_to(t, ref.shape[:-1] + (1,))


class Generator(nn.Module):
    """MLP decoder: (z, t) -> flattened coordinates (n_atoms*3,).

    ``t`` is the normalized frame index / reaction coordinate in [0, 1]
    (the reference conditions on frame_num/total, GAN_V17.12/gan.py:279-305).
    """

    n_atoms: int
    latent_dim: int = 31
    hidden: Sequence[int] = (128, 256, 512)

    @nn.compact
    def __call__(self, z: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        t = _conform_time(t, z)
        x = jnp.concatenate([z, t], axis=-1)
        for width in self.hidden:
            x = nn.relu(nn.Dense(width)(x))
        x = nn.Dense(self.n_atoms * 3)(x)
        return x

    def coords(self, z, t):
        """Generated coordinates reshaped to (..., n_atoms, 3)."""
        flat = self(z, t)
        return flat.reshape(flat.shape[:-1] + (self.n_atoms, 3))


class Discriminator(nn.Module):
    """MLP critic on (t, features): BCE-logit output.

    ``features`` can be flattened coordinates, dihedral angles or distance
    matrices, covering the reference's D_pos / D_phi / distance-matrix
    discriminator variants with one module.
    """

    hidden: Sequence[int] = (512, 256, 128)

    @nn.compact
    def __call__(self, features: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        t = _conform_time(t, features)
        x = jnp.concatenate([t, features], axis=-1)
        for width in self.hidden:
            x = nn.leaky_relu(nn.Dense(width)(x), 0.2)
        return nn.Dense(1)(x)[..., 0]
