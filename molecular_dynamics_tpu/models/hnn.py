"""Hamiltonian neural networks.

Re-design of the reference's Greydanus-derived HNN
(Hamiltonian/Mol-HNN-cuda-v4.2/cuda_hnn.py:10-72): the network learns two
scalar fields F1 (conservative) and F2 (Hamiltonian/solenoidal); the phase-
space time derivative is

    dx/dt = grad(F1)            (conservative part)
          + J^T grad(F2)        (symplectic/solenoidal part)

with J the canonical symplectic map. In JAX the second-order autograd the
reference needs (autograd.grad inside the training graph,
cuda_hnn.py:33-55) is just ``jax.grad`` composed with ``jax.vmap`` — no
create_graph bookkeeping.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from molecular_dynamics_tpu.models.common import MLP


class HNN(nn.Module):
    """Scalar-field network: x (..., 2n) -> (F1, F2) pair."""

    hidden: Sequence[int] = (200, 200, 200, 200, 200)
    field_type: str = "solenoidal"  # "solenoidal" | "conservative" | "both"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return MLP(
            tuple(self.hidden) + (2,),
            activation=nn.tanh,
            use_orthogonal_init=True,
        )(x)


def symplectic_apply(g: jnp.ndarray) -> jnp.ndarray:
    """J^T grad: (dH/dp, -dH/dq) for x = (q, p) split at the midpoint —
    the reference's permutation tensor M (cuda_hnn.py:57-72)."""
    n = g.shape[-1] // 2
    return jnp.concatenate([g[..., n:], -g[..., :n]], axis=-1)


def time_derivative(model: HNN, params, x: jnp.ndarray) -> jnp.ndarray:
    """Phase-space vector field dx/dt at x (batched over leading axes)."""

    def f1(xi):
        return model.apply(params, xi)[0]

    def f2(xi):
        return model.apply(params, xi)[1]

    flat = x.reshape(-1, x.shape[-1])
    out = jnp.zeros_like(flat)
    if model.field_type in ("conservative", "both"):
        out = out + jax.vmap(jax.grad(f1))(flat)
    if model.field_type in ("solenoidal", "both"):
        out = out + symplectic_apply(jax.vmap(jax.grad(f2))(flat))
    return out.reshape(x.shape)


def rollout(
    model: HNN,
    params,
    x0: jnp.ndarray,
    n_steps: int,
    dt: float = 0.005,
    noise_std: float = 0.0,
    key=None,
    max_step: float = None,
    corrector=None,
) -> jnp.ndarray:
    """Autoregressive generation ``x += dx_hat * dt (+ noise)`` — the
    reference's 10k-frame generation loop (HNN-Full.py:294-329) as one scan.
    Returns (n_steps, ...) trajectory of states. ``max_step`` clamps the
    per-step displacement componentwise (long rollouts compound one
    out-of-distribution prediction into collapse/divergence); ``corrector``
    relaxes each generated state (train.seq.make_frame_corrector).
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    def step(carry, _):
        x, k = carry
        dx = time_derivative(model, params, x)
        d = dx * dt
        if max_step is not None:
            d = jnp.clip(d, -max_step, max_step)
        x = x + d
        if corrector is not None:
            x = corrector(x)
        if noise_std > 0:
            k, sub = jax.random.split(k)
            x = x + noise_std * jax.random.normal(sub, x.shape, x.dtype)
        return (x, k), x

    _, traj = jax.lax.scan(step, (x0, key), None, length=n_steps)
    return traj
