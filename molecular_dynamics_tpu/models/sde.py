"""Neural SDE-GAN: Stratonovich SDE generator + neural CDE discriminator.

Re-design of the reference's torchsde experiment (TorchSDE/torchsde_v2/
sde.py — SURVEY.md §2.10): the generator integrates a learned Stratonovich
SDE with the reversible Heun scheme (sde.py:106-107 used sdeint_adjoint with
method="reversible_heun"); the discriminator is a neural CDE driven by the
linearly-interpolated data path (sde.py:126-164); activations are LipSwish
(sde.py:22-46); training is Wasserstein-style with weight clipping for the
Lipschitz constraint and a force-field potential loss injected periodically
(sde.py:437-478).

In JAX the integrators are ``lax.scan`` loops — differentiable end-to-end
without adjoint machinery (checkpoint the scan for long horizons).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def lipswish(x: jnp.ndarray) -> jnp.ndarray:
    """0.909 * swish — Lipschitz-constant-1 activation (sde.py:22-27)."""
    return 0.909 * jax.nn.silu(x)


class _LipMLP(nn.Module):
    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate(self.features):
            x = nn.Dense(w)(x)
            if i < len(self.features) - 1:
                x = lipswish(x)
        return x


class SDEGenerator(nn.Module):
    """Latent Stratonovich SDE with linear readout to data space.

    ``__call__(key, ts, batch) -> (batch, len(ts), data_dim)`` generates
    trajectories by reversible-Heun integration of
    ``dX = mu(t, X) dt + sigma(t, X) o dW``.
    """

    data_dim: int
    latent_dim: int = 32
    noise_dim: int = 8
    hidden: Sequence[int] = (64, 64)
    init_noise_dim: int = 16

    def setup(self):
        self.initial = _LipMLP((64, self.latent_dim))
        self.drift = _LipMLP(tuple(self.hidden) + (self.latent_dim,))
        self.diffusion = _LipMLP(
            tuple(self.hidden) + (self.latent_dim * self.noise_dim,)
        )
        self.readout = nn.Dense(self.data_dim)

    def _mu(self, t, x):
        t = jnp.broadcast_to(jnp.asarray(t, x.dtype), x.shape[:-1] + (1,))
        return self.drift(jnp.concatenate([t, x], axis=-1))

    def _sigma(self, t, x):
        t = jnp.broadcast_to(jnp.asarray(t, x.dtype), x.shape[:-1] + (1,))
        out = self.diffusion(jnp.concatenate([t, x], axis=-1))
        return out.reshape(x.shape[:-1] + (self.latent_dim, self.noise_dim))

    def __call__(self, key, ts: jnp.ndarray, batch: int) -> jnp.ndarray:
        k_init, k_noise = jax.random.split(key)
        z0 = jax.random.normal(k_init, (batch, self.init_noise_dim))
        y0 = self.initial(z0)

        dts = jnp.diff(ts)
        n_steps = dts.shape[0]
        dw = jax.random.normal(
            k_noise, (n_steps, batch, self.noise_dim)
        ) * jnp.sqrt(dts)[:, None, None]

        def heun_step(carry, inp):
            y, y_hat, t = carry
            dt, dw_n = inp
            # reversible Heun (Kidger et al. 2021), Stratonovich
            f_hat = self._mu(t, y_hat)
            g_hat = self._sigma(t, y_hat)
            gw_hat = jnp.einsum("bln,bn->bl", g_hat, dw_n)
            y_hat_next = 2.0 * y - y_hat + f_hat * dt + gw_hat
            t_next = t + dt
            f_next = self._mu(t_next, y_hat_next)
            g_next = self._sigma(t_next, y_hat_next)
            gw_next = jnp.einsum("bln,bn->bl", g_next, dw_n)
            y_next = y + 0.5 * ((f_hat + f_next) * dt + gw_hat + gw_next)
            return (y_next, y_hat_next, t_next), y_next

        # materialize drift/diffusion params before entering the scan (flax
        # cannot create params inside lax.scan)
        _ = self._mu(ts[0], y0)
        _ = self._sigma(ts[0], y0)
        (_, _, _), ys = jax.lax.scan(heun_step, (y0, y0, ts[0]), (dts, dw))
        ys = jnp.concatenate([y0[None], ys], axis=0)  # (T, B, latent)
        return self.readout(jnp.moveaxis(ys, 0, 1))  # (B, T, data)


class CDEDiscriminator(nn.Module):
    """Neural CDE score over (time-augmented) trajectories.

    ``__call__(paths (B, T, data_dim), ts) -> (B,)``: integrates
    ``dH = f(H) dY`` along the linear interpolation of the input path
    (sde.py:126-164), reads out a scalar critic value.
    """

    data_dim: int
    hidden_dim: int = 32
    f_hidden: Sequence[int] = (64,)

    def setup(self):
        self.embed = nn.Dense(self.hidden_dim)
        # f: H -> dH/dY matrix (hidden_dim x (data_dim + 1 time channel))
        self.field = _LipMLP(
            tuple(self.f_hidden) + (self.hidden_dim * (self.data_dim + 1),)
        )
        self.readout = nn.Dense(1)

    def __call__(self, paths: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        b, t, d = paths.shape
        y = jnp.concatenate(
            [jnp.broadcast_to(ts[None, :, None], (b, t, 1)), paths], axis=-1
        )  # time-augmented control path
        h0 = self.embed(y[:, 0, :])
        _ = self.field(h0)  # materialize params before the scan
        dy = jnp.moveaxis(jnp.diff(y, axis=1), 1, 0)  # (T-1, B, d+1)

        def step(h, dy_k):
            f = self.field(h).reshape(h.shape[:-1] + (self.hidden_dim, d + 1))
            # midpoint (Heun) update of the controlled ODE
            h_tilde = h + jnp.einsum("bhc,bc->bh", f, dy_k)
            f2 = self.field(h_tilde).reshape(
                h.shape[:-1] + (self.hidden_dim, d + 1)
            )
            h_next = h + 0.5 * jnp.einsum("bhc,bc->bh", f + f2, dy_k)
            return h_next, None

        h_final, _ = jax.lax.scan(step, h0, dy)
        return self.readout(h_final)[..., 0]
