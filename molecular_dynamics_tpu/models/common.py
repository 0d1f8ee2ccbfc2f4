"""Shared model building blocks."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    """Plain MLP with configurable widths and activations.

    The reference's workhorse (Hamiltonian/.../cuda_nn_models.py:27-49 with
    orthogonal init; the GAN generator/discriminator stacks are the same
    shape, GAN_V17.12/gan.py:93-146).
    """

    features: Sequence[int]
    activation: Callable = nn.relu
    final_activation: Optional[Callable] = None
    use_orthogonal_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_init = (
            nn.initializers.orthogonal()
            if self.use_orthogonal_init
            else nn.initializers.lecun_normal()
        )
        for i, width in enumerate(self.features):
            x = nn.Dense(width, kernel_init=kernel_init)(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
            elif self.final_activation is not None:
                x = self.final_activation(x)
        return x
