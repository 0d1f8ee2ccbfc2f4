"""Conditional RealNVP normalizing flow.

Re-design of the reference's cFlow (cFlow/cFlow_1.0.0/cflow.py:321-518):
masked affine coupling layers with alternating binary masks, conditioned on
the normalized frame index, exact ``log_prob`` for NLL training and inverse-
pass conditional sampling. The reference's flow BatchNorm (running-stats
inside the bijection, cflow.py:367-417) is replaced by ActNorm — a
data-independent affine bijection that keeps the flow stateless and jit/vmap
friendly on TPU while serving the same scale-stabilising role.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class AffineCoupling(nn.Module):
    """Masked affine coupling y = mask*x + (1-mask)*(x*exp(s) + t)."""

    mask: Tuple[int, ...]
    hidden: Sequence[int] = (256, 256)
    cond_dim: int = 1

    @nn.compact
    def __call__(self, x, cond, reverse: bool = False):
        mask = jnp.asarray(self.mask, x.dtype)
        h = jnp.concatenate([x * mask, cond], axis=-1)
        for w in self.hidden:
            h = nn.relu(nn.Dense(w)(h))
        s = nn.tanh(nn.Dense(x.shape[-1])(h)) * (1.0 - mask)
        t = nn.Dense(x.shape[-1])(h) * (1.0 - mask)
        if reverse:
            y = mask * x + (1.0 - mask) * ((x - t) * jnp.exp(-s))
            log_det = -jnp.sum(s, axis=-1)
        else:
            y = mask * x + (1.0 - mask) * (x * jnp.exp(s) + t)
            log_det = jnp.sum(s, axis=-1)
        return y, log_det


class ActNorm(nn.Module):
    """Learned per-feature affine bijection (BatchNorm stand-in)."""

    dim: int

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        log_scale = self.param(
            "log_scale", nn.initializers.zeros, (self.dim,)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if reverse:
            y = (x - bias) * jnp.exp(-log_scale)
            log_det = -jnp.sum(log_scale) * jnp.ones(x.shape[:-1], x.dtype)
        else:
            y = x * jnp.exp(log_scale) + bias
            log_det = jnp.sum(log_scale) * jnp.ones(x.shape[:-1], x.dtype)
        return y, log_det


class RealNVP(nn.Module):
    """Alternating-mask RealNVP with conditioning input."""

    dim: int
    n_coupling: int = 6
    hidden: Sequence[int] = (256, 256)
    cond_dim: int = 1

    def setup(self):
        masks = []
        base = np.arange(self.dim) % 2
        for i in range(self.n_coupling):
            masks.append(tuple((base if i % 2 == 0 else 1 - base).tolist()))
        self.couplings = [
            AffineCoupling(mask=m, hidden=tuple(self.hidden), cond_dim=self.cond_dim)
            for m in masks
        ]
        self.norms = [ActNorm(dim=self.dim) for _ in range(self.n_coupling)]

    def forward(self, x, cond):
        """Data -> latent; returns (z, total log|det J|)."""
        log_det = jnp.zeros(x.shape[:-1], x.dtype)
        for coupling, norm in zip(self.couplings, self.norms):
            x, ld = norm(x)
            log_det = log_det + ld
            x, ld = coupling(x, cond)
            log_det = log_det + ld
        return x, log_det

    def inverse(self, z, cond):
        """Latent -> data (conditional sampling path, cflow.py:488-518)."""
        for coupling, norm in zip(
            reversed(self.couplings), reversed(self.norms)
        ):
            z, _ = coupling(z, cond, reverse=True)
            z, _ = norm(z, reverse=True)
        return z

    def __call__(self, x, cond):
        return self.log_prob(x, cond)

    def log_prob(self, x, cond):
        """Exact log density under a standard-normal base (cflow.py:435-465)."""
        z, log_det = self.forward(x, cond)
        log_base = -0.5 * jnp.sum(
            z**2 + jnp.log(2 * jnp.pi), axis=-1
        )
        return log_base + log_det

    def sample(self, key, cond, n: int):
        z = jax.random.normal(key, (n, self.dim))
        return self.inverse(z, jnp.broadcast_to(cond, (n, self.cond_dim)))
