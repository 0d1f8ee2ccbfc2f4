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
    #: > 0 conditions the SDE on a per-path context vector (e.g. Fourier
    #: features of the window's normalized campaign time): the context
    #: enters the initial-state net and every drift/diffusion evaluation.
    #: The unconditional plateau (e2e err ~1.9 A) is the conditional mean
    #: being off — same failure mode MDX_FLOW_TEMB cured for the cflow.
    cond_dim: int = 0

    def setup(self):
        self.initial = _LipMLP((64, self.latent_dim))
        self.drift = _LipMLP(tuple(self.hidden) + (self.latent_dim,))
        self.diffusion = _LipMLP(
            tuple(self.hidden) + (self.latent_dim * self.noise_dim,)
        )
        self.readout = nn.Dense(self.data_dim)

    def _with_cond(self, t, x, cond):
        t = jnp.broadcast_to(jnp.asarray(t, x.dtype), x.shape[:-1] + (1,))
        parts = [t, x]
        if self.cond_dim:
            parts.append(jnp.broadcast_to(cond, x.shape[:-1] + (self.cond_dim,)))
        return jnp.concatenate(parts, axis=-1)

    def _mu(self, t, x, cond=None):
        return self.drift(self._with_cond(t, x, cond))

    def _sigma(self, t, x, cond=None):
        out = self.diffusion(self._with_cond(t, x, cond))
        return out.reshape(x.shape[:-1] + (self.latent_dim, self.noise_dim))

    def __call__(
        self, key, ts: jnp.ndarray, batch: int, cond: jnp.ndarray = None
    ) -> jnp.ndarray:
        k_init, k_noise = jax.random.split(key)
        z0 = jax.random.normal(k_init, (batch, self.init_noise_dim))
        if self.cond_dim:
            z0 = jnp.concatenate(
                [z0, jnp.broadcast_to(cond, (batch, self.cond_dim))], axis=-1
            )
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
            f_hat = self._mu(t, y_hat, cond)
            g_hat = self._sigma(t, y_hat, cond)
            gw_hat = jnp.einsum("bln,bn->bl", g_hat, dw_n)
            y_hat_next = 2.0 * y - y_hat + f_hat * dt + gw_hat
            t_next = t + dt
            f_next = self._mu(t_next, y_hat_next, cond)
            g_next = self._sigma(t_next, y_hat_next, cond)
            gw_next = jnp.einsum("bln,bn->bl", g_next, dw_n)
            y_next = y + 0.5 * ((f_hat + f_next) * dt + gw_hat + gw_next)
            return (y_next, y_hat_next, t_next), y_next

        # materialize drift/diffusion params before entering the scan (flax
        # cannot create params inside lax.scan)
        _ = self._mu(ts[0], y0, cond)
        _ = self._sigma(ts[0], y0, cond)
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
    #: > 0: a per-path context vector enters the initial hidden state. A
    #: constant channel on the control path would be invisible to the CDE
    #: (it only sees dY), so conditioning must go through h0.
    cond_dim: int = 0

    def setup(self):
        self.embed = nn.Dense(self.hidden_dim)
        # f: H -> dH/dY matrix (hidden_dim x (data_dim + 1 time channel))
        self.field = _LipMLP(
            tuple(self.f_hidden) + (self.hidden_dim * (self.data_dim + 1),)
        )
        self.readout = nn.Dense(1)

    def __call__(
        self, paths: jnp.ndarray, ts: jnp.ndarray, cond: jnp.ndarray = None
    ) -> jnp.ndarray:
        b, t, d = paths.shape
        y = jnp.concatenate(
            [jnp.broadcast_to(ts[None, :, None], (b, t, 1)), paths], axis=-1
        )  # time-augmented control path
        h0_in = y[:, 0, :]
        if self.cond_dim:
            h0_in = jnp.concatenate(
                [h0_in, jnp.broadcast_to(cond, (b, self.cond_dim))], axis=-1
            )
        h0 = self.embed(h0_in)
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
