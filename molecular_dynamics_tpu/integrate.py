"""Integrators, thermostats, initial conditions and minimizers.

Replaces two things from the reference stack (SURVEY.md §2.12):

- the torchmd ``Integrator`` (Langevin velocity-Verlet) demonstrated in
  V_Calculations/Test-1/tutorial.ipynb cells 13-18, and
- the NAMD inner MD loop configured by
  All_ML_Training_Data/210905_SMD_decaalanine/SMD/gendirs_GBIS.py:44-101
  (Langevin NVT at 300 K, damping 1/ps, 2 fs steps).

Every step is a pure ``MDState -> MDState`` function built around a caller-
supplied force function, so it jits, ``lax.scan``s over time, ``vmap``s over
replicas and differentiates end-to-end (the HNN / force-bias GAN training
paths backprop through these steps).

Units: dt in femtoseconds at the API (converted internally by TIMEFACTOR),
gamma in 1/ps, temperatures in Kelvin; see ``mdx.units``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from molecular_dynamics_tpu import units
from molecular_dynamics_tpu.system import MDState

Array = jnp.ndarray
ForceFn = Callable[[Array, Array], Array]  # (pos, box) -> forces


def _split_keys(key: jax.Array):
    """Split a single key or a leading-axis batch of replica keys."""
    if key.ndim == 1:
        k1, k2 = jax.random.split(key)
        return k1, k2
    ks = jax.vmap(jax.random.split)(key)
    return ks[:, 0], ks[:, 1]


def _normal_like(key: jax.Array, template: Array) -> Array:
    """Per-replica independent normal noise for single or batched keys."""
    if key.ndim == 1:
        return jax.random.normal(key, template.shape, template.dtype)
    return jax.vmap(
        lambda k: jax.random.normal(k, template.shape[1:], template.dtype)
    )(key)


# ---------------------------------------------------------------------------
# kinetic quantities and initial conditions
# ---------------------------------------------------------------------------


def kinetic_energy(vel: Array, masses: Array) -> Array:
    """0.5 * sum(m v^2) in kcal/mol (velocities in internal units)."""
    return 0.5 * jnp.sum(masses[..., :, None] * vel * vel, axis=(-2, -1))


def temperature(ekin: Array, n_atoms: int) -> Array:
    """Instantaneous temperature from kinetic energy (3N degrees of freedom)."""
    return 2.0 * ekin / (3.0 * n_atoms * units.BOLTZMANN)


def maxwell_boltzmann(key: jax.Array, masses: Array, T: float) -> Array:
    """Sample velocities from the Maxwell-Boltzmann distribution at T.

    Equivalent of torchmd's ``maxwell_boltzmann`` used for system setup in
    the reference (V_Calculations/Test-5_bias_n_improper/potcalc.py:24).
    """
    std = jnp.sqrt(units.BOLTZMANN * T / masses)[:, None]
    return std * jax.random.normal(key, masses.shape + (3,), masses.dtype)


# ---------------------------------------------------------------------------
# integrator steps
# ---------------------------------------------------------------------------


def velocity_verlet_step(
    state: MDState, force_fn: ForceFn, masses: Array, dt_fs: float
) -> MDState:
    """One NVE velocity-Verlet step.

    ``state.forces`` must hold the forces at ``state.pos`` (seed with
    :func:`initialize_forces`); they are reused so each step costs exactly
    one force evaluation.
    """
    dt = dt_fs / units.TIMEFACTOR
    m = masses[:, None]
    accel = state.forces / m
    vel_half = state.vel + 0.5 * dt * accel
    pos = state.pos + dt * vel_half
    forces = force_fn(pos, state.box)
    vel = vel_half + 0.5 * dt * forces / m
    return state.replace(pos=pos, vel=vel, forces=forces, step=state.step + 1)


def langevin_step(
    state: MDState,
    force_fn: ForceFn,
    masses: Array,
    dt_fs: float,
    T: float,
    gamma_ps: float = 1.0,
) -> MDState:
    """One BAOAB Langevin (NVT) step.

    BAOAB splitting (Leimkuhler & Matthews) — superior configurational
    sampling accuracy to the reference's Langevin-velocity-Verlet at the same
    2 fs timestep; one force evaluation per step.
    """
    dt = dt_fs / units.TIMEFACTOR
    gamma = gamma_ps * (units.TIMEFACTOR / 1000.0)  # 1/ps -> 1/internal-time
    m = masses[:, None]
    key, noise_key = _split_keys(state.key)

    # B: half kick with stored forces
    vel = state.vel + 0.5 * dt * state.forces / m
    # A: half drift
    pos = state.pos + 0.5 * dt * vel
    # O: Ornstein-Uhlenbeck exact solve
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt(units.BOLTZMANN * T / m * (1.0 - c1 * c1))
    noise = _normal_like(noise_key, vel)
    vel = c1 * vel + c2 * noise
    # A: half drift
    pos = pos + 0.5 * dt * vel
    # B: half kick with new forces
    forces = force_fn(pos, state.box)
    vel = vel + 0.5 * dt * forces / m
    return state.replace(
        pos=pos, vel=vel, forces=forces, key=key, step=state.step + 1
    )


def initialize_forces(state: MDState, force_fn: ForceFn) -> MDState:
    """Seed ``state.forces`` with the forces at the current positions."""
    return state.replace(forces=force_fn(state.pos, state.box))


# ---------------------------------------------------------------------------
# minimization
# ---------------------------------------------------------------------------


def minimize_fire(
    pos: Array,
    force_fn: Callable[[Array], Array],
    n_steps: int = 500,
    dt_start: float = 0.02,
    dt_max: float = 0.2,
    n_min: int = 5,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
    max_disp: float = 0.0,
) -> Array:
    """FIRE structure minimization (fused lax.fori_loop; jit-compatible).

    Plays the role of ``minimize_bfgs`` in the reference's bring-up loop
    (V_Calculations/Test-1/tutorial.ipynb cell 14) as the pre-dynamics
    relaxation (NAMD's ``minimize 500``, gendirs_GBIS.py:99).

    ``max_disp > 0`` clamps each step's per-component displacement (a
    trust region): required when the start is far from physical (e.g.
    relaxing model-generated frames with clashes, where |F| can reach 1e6
    and one unclamped step throws atoms thousands of Angstrom).
    """

    def body(_, carry):
        pos, vel, dt, alpha, n_pos = carry
        f = force_fn(pos)
        power = jnp.vdot(f, vel)
        f_norm = jnp.sqrt(jnp.sum(f * f)) + 1e-12
        v_norm = jnp.sqrt(jnp.sum(vel * vel))
        vel = (1.0 - alpha) * vel + alpha * f / f_norm * v_norm

        uphill = power <= 0.0
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), dt)
        alpha = jnp.where(grow, alpha * f_alpha, alpha)
        dt = jnp.where(uphill, dt * f_dec, dt)
        alpha = jnp.where(uphill, alpha_start, alpha)
        vel = jnp.where(uphill, jnp.zeros_like(vel), vel)

        vel = vel + dt * f
        disp = dt * vel
        if max_disp > 0.0:
            disp = jnp.clip(disp, -max_disp, max_disp)
        pos = pos + disp
        return pos, vel, dt, alpha, n_pos

    init = (
        pos,
        jnp.zeros_like(pos),
        jnp.asarray(dt_start, pos.dtype),
        jnp.asarray(alpha_start, pos.dtype),
        jnp.zeros((), jnp.int32),
    )
    pos, *_ = jax.lax.fori_loop(0, n_steps, body, init)
    return pos


def minimize_lbfgs(
    pos: Array,
    energy_fn: Callable[[Array], Array],
    n_steps: int = 100,
    history: int = 10,
    c1: float = 1e-4,
    max_ls: int = 20,
    curvature_eps: float = 1e-10,
) -> Array:
    """L-BFGS structure minimization (fully jit-compatible, static shapes).

    The quasi-Newton counterpart of the reference tutorial's
    ``minimize_bfgs`` (V_Calculations/Test-1/tutorial.ipynb cell 14, from
    upstream torchmd): limited-memory two-loop recursion over a fixed
    ``history``-slot circular buffer, with an Armijo backtracking line
    search run as a ``lax.while_loop``. Converges much faster than FIRE on
    stiff LJ contacts; everything (curvature filtering, buffer rotation,
    line search) is branchless masked arithmetic so the whole minimization
    is one compiled ``fori_loop``.

    ``energy_fn`` maps positions (same shape as ``pos``) to a scalar.
    """
    shape = pos.shape
    x0 = pos.reshape(-1)
    d_dim = x0.shape[0]
    m = history
    dtype = x0.dtype

    val_grad = jax.value_and_grad(lambda x: energy_fn(x.reshape(shape)))

    def two_loop(g, s_buf, y_buf, rho, k):
        """r = H_k @ g with the standard two-loop recursion."""
        idxs = (k - 1 - jnp.arange(m)) % m  # newest .. oldest
        valid = (jnp.arange(m) < jnp.minimum(k, m)).astype(dtype)

        def bwd(i, carry):
            q, alphas = carry
            j = idxs[i]
            a = rho[j] * jnp.vdot(s_buf[j], q) * valid[i]
            return q - a * y_buf[j], alphas.at[i].set(a)

        q, alphas = jax.lax.fori_loop(
            0, m, bwd, (g, jnp.zeros((m,), dtype))
        )
        jm = (k - 1) % m
        sy = jnp.vdot(s_buf[jm], y_buf[jm])
        yy = jnp.vdot(y_buf[jm], y_buf[jm])
        gamma = jnp.where((k > 0) & (yy > 1e-12), sy / yy, 1.0)
        r = gamma * q

        def fwd(i, r):
            ii = m - 1 - i
            j = idxs[ii]
            b = rho[j] * jnp.vdot(y_buf[j], r)
            return r + (alphas[ii] - b) * s_buf[j] * valid[ii]

        return jax.lax.fori_loop(0, m, fwd, r)

    def body(_, carry):
        x, e, g, s_buf, y_buf, rho, k = carry
        d = -two_loop(g, s_buf, y_buf, rho, k)
        gd = jnp.vdot(g, d)
        # safeguard: fall back to steepest descent on a non-descent direction
        bad = gd >= 0.0
        d = jnp.where(bad, -g, d)
        gd = jnp.where(bad, -jnp.vdot(g, g), gd)

        def ls_cond(ls):
            alpha, n, e_new, _, _ = ls
            # NaN energies (blow-up at large alpha) must keep shrinking,
            # so test the *negation* of Armijo acceptance
            return jnp.logical_not(
                e_new <= e + c1 * alpha * gd
            ) & (n < max_ls)

        def ls_body(ls):
            alpha, n, _, _, _ = ls
            alpha = jnp.where(n > 0, alpha * 0.5, alpha)
            e_new, g_new = val_grad(x + alpha * d)
            return alpha, n + 1, e_new, g_new, alpha

        e_try, g_try = val_grad(x + d)
        alpha, _, e_new, g_new, _ = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.asarray(1.0, dtype), jnp.int32(1), e_try, g_try,
             jnp.asarray(1.0, dtype)),
        )
        # reject the step entirely if the line search never found descent
        ok = e_new <= e
        x_new = jnp.where(ok, x + alpha * d, x)
        e_new = jnp.where(ok, e_new, e)
        g_new = jnp.where(ok, g_new, g)

        s = x_new - x
        y = g_new - g
        sy = jnp.vdot(s, y)
        keep = ok & (sy > curvature_eps)
        slot = k % m
        s_buf = jnp.where(keep, s_buf.at[slot].set(s), s_buf)
        y_buf = jnp.where(keep, y_buf.at[slot].set(y), y_buf)
        rho = jnp.where(
            keep, rho.at[slot].set(1.0 / jnp.maximum(sy, curvature_eps)),
            rho,
        )
        k = jnp.where(keep, k + 1, k)
        return x_new, e_new, g_new, s_buf, y_buf, rho, k

    e0, g0 = val_grad(x0)
    init = (
        x0, e0, g0,
        jnp.zeros((m, d_dim), dtype),
        jnp.zeros((m, d_dim), dtype),
        jnp.zeros((m,), dtype),
        jnp.zeros((), jnp.int32),
    )
    x, *_ = jax.lax.fori_loop(0, n_steps, body, init)
    return x.reshape(shape)


def minimize_gd(
    pos: Array,
    force_fn: Callable[[Array], Array],
    n_steps: int = 200,
    lr: float = 1e-4,
    max_disp: float = 0.1,
) -> Array:
    """Clipped steepest-descent relaxation (robust for very bad contacts)."""

    def body(_, p):
        f = force_fn(p)
        step = lr * f
        norm = jnp.sqrt(jnp.sum(step * step, axis=-1, keepdims=True))
        step = step * jnp.minimum(1.0, max_disp / (norm + 1e-12))
        return p + step

    return jax.lax.fori_loop(0, n_steps, body, pos)
