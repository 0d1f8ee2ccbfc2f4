"""Transformer over per-atom coordinate/torsion time series.

Equivalent of Molecule_Dynamics_v1/Transformer_V2/transformer.py:97-135:
a TransformerEncoder over a history window of small per-step feature vectors
(xyz + phi + psi in V2; positions only in V1) predicting the next step from
the final token.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class EncoderBlock(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int

    @nn.compact
    def __call__(self, x, mask=None):
        attn = nn.SelfAttention(num_heads=self.n_heads)(x, mask=mask)
        x = nn.LayerNorm()(x + attn)
        ff = nn.Dense(self.d_model)(nn.gelu(nn.Dense(self.d_ff)(x)))
        return nn.LayerNorm()(x + ff)


class TrajectoryTransformer(nn.Module):
    """(batch, history, features) -> (batch, features) next-step head."""

    out_dim: int
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 6
    d_ff: int = 128
    causal: bool = False

    @nn.compact
    def __call__(self, window: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.d_model)(window)
        t = window.shape[-2]
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (t, self.d_model),
        )
        h = h + pos
        mask = None
        if self.causal:
            mask = jnp.tril(jnp.ones((t, t), bool))
        for _ in range(self.n_layers):
            h = EncoderBlock(self.d_model, self.n_heads, self.d_ff)(h, mask)
        return nn.Dense(self.out_dim)(h[..., -1, :])
