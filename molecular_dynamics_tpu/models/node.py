"""Neural-ODE wrappers (the torchdyn HNN variant + generic field rollouts).

Covers Molecule_Dynamics_Torchdyn/hnn_v0/hnn.py:13-95 (NeuralODE with
dopri5 + adjoint sensitivity around an HNN vector field) and the scipy
``integrate_model``/``rk4`` helpers (Hamiltonian/.../cuda_utils.py:11-28):

- ``odeint_field`` — adaptive dopri (jax.experimental.ode.odeint, which
  implements adjoint-style reverse-mode differentiation),
- ``rk4_rollout`` — fixed-step RK4 as a fused lax.scan.

Both differentiate end-to-end through the solver.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Field = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x, t) -> dx/dt


def odeint_field(field: Field, x0: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
    """Adaptive-step integration of dx/dt = field(x, t) at times ``ts``.

    Uses jax.experimental.ode.odeint (dopri with adjoint reverse-mode) —
    the JAX equivalent of torchdyn's NeuralODE(sensitivity='adjoint',
    solver='dopri5').
    """
    from jax.experimental.ode import odeint

    return odeint(lambda x, t: field(x, t), x0, ts)


def rk4_step(field: Field, x: jnp.ndarray, t: jnp.ndarray, dt: float):
    """Classic RK4 (cuda_utils.py:21-28)."""
    k1 = field(x, t)
    k2 = field(x + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = field(x + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = field(x + dt * k3, t + dt)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def rk4_rollout(
    field: Field,
    x0: jnp.ndarray,
    n_steps: int,
    dt: float,
    t0: float = 0.0,
    max_step: float = None,
    state_bounds=None,
    corrector=None,
) -> jnp.ndarray:
    """Fixed-step RK4 rollout as one scan; returns (n_steps, ...) states.

    ``max_step`` clamps the per-step state displacement (componentwise)
    and ``state_bounds=(lo, hi)`` clamps the state to the training
    distribution's support: long autoregressive rollouts of a learned
    field compound one out-of-distribution prediction into divergence,
    the same failure the GNS rollout clamps guard against;
    ``corrector`` relaxes each generated state (train.seq.make_frame_corrector).
    """

    def body(carry, _):
        x, t = carry
        x_new = rk4_step(field, x, t, dt)
        if max_step is not None:
            x_new = x + jnp.clip(x_new - x, -max_step, max_step)
        if state_bounds is not None:
            x_new = jnp.clip(x_new, state_bounds[0], state_bounds[1])
        if corrector is not None:
            x_new = corrector(x_new)
        return (x_new, t + dt), x_new

    _, traj = jax.lax.scan(body, (x0, jnp.asarray(t0)), None, length=n_steps)
    return traj


def hnn_field(model, params) -> Field:
    """Wrap an HNN as an autonomous ODE field (hnn.py:13-45)."""
    from molecular_dynamics_tpu.models.hnn import time_derivative

    def field(x, t):
        del t
        return time_derivative(model, params, x)

    return field
