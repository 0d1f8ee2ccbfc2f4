"""Angle/torsion terms as MXU matmuls (gather-free bonded evaluation).

TPU gathers over small index tables are the most expensive part of the XLA
force step (profiling: the bonded gather terms cost more than the dense N^2
nonbonded matrix). This module removes every gather/scatter: bond-vector
extraction ``pos[i] - pos[j]`` becomes a static {+1, -1} difference matrix
applied per coordinate axis as ``(R, N) @ (N, A)`` — dense MXU matmuls in
full f32 (``Precision.HIGHEST``; the default bf16 matmul inputs would cost
~0.05 A of coordinate error) — and the force scatter comes out of ``jax.vjp``
as the transposed matmuls. Angle/torsion math itself runs on (R, A) arrays.

Physics matches ``mdx.energy._angle_energy`` / ``_torsion_energy`` exactly
(same atan2 formulations); padding rows use real atoms with k0 = 0 so
gradients stay finite.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from molecular_dynamics_tpu.ff.params import FFParams

_PAD = 128  # pad term counts to the MXU tile

_MM = jax.lax.Precision.HIGHEST


def _pad_rows(n: int) -> int:
    return max(_PAD, ((n + _PAD - 1) // _PAD) * _PAD)


def _diff_matrix_t(n_atoms: int, plus: np.ndarray, minus: np.ndarray, rows: int):
    """Transposed difference matrix (N, rows): column a = e_plus - e_minus."""
    d = np.zeros((n_atoms, rows), np.float32)
    r = np.arange(len(plus))
    d[plus, r] += 1.0
    d[minus, r] -= 1.0
    return d


def make_angle_torsion_op(ff: FFParams, dtype=jnp.float32, precision=None):
    """Build ``angle_torsion(pos (R, N, 3)) -> (energy (R,), forces (R, N, 3))``.

    Covers angles + dihedrals + impropers (multi-term, AMBER/CHARMM branch).
    Fully differentiable (plain jax — forces ARE the gradient), no gathers.

    ``precision``: matmul precision for the bond-vector extraction; defaults
    to full f32 (Precision.HIGHEST). The fused simulation path passes
    Precision.HIGH (bf16x3): force error ~1e-4 relative — beneath thermostat
    noise — for ~35% fewer MXU passes.
    """
    n = ff.n_atoms
    mm = _MM if precision is None else precision

    # --- angles ---
    angles = np.asarray(ff.angles)
    a_rows = _pad_rows(len(angles)) if len(angles) else 0
    if a_rows:
        pad = a_rows - len(angles)
        idx = np.concatenate([angles, np.tile([[0, 1, 2]], (pad, 1))])
        k0 = np.concatenate([np.asarray(ff.angle_params)[:, 0], np.zeros(pad)])
        t0 = np.concatenate([np.asarray(ff.angle_params)[:, 1], np.zeros(pad)])
        d21 = jnp.asarray(_diff_matrix_t(n, idx[:, 0], idx[:, 1], a_rows))
        d23 = jnp.asarray(_diff_matrix_t(n, idx[:, 2], idx[:, 1], a_rows))
        ang_k = jnp.asarray(k0, dtype)
        ang_t0 = jnp.asarray(t0, dtype)

    # --- torsions: dihedrals + impropers share one padded table ---
    tor_idx = []
    tor_params = []
    tor_mask = []
    max_t = 1
    for idx_arr, par, msk in (
        (ff.dihedrals, ff.dihedral_params, ff.dihedral_term_mask),
        (ff.impropers, ff.improper_params, ff.improper_term_mask),
    ):
        idx_arr = np.asarray(idx_arr)
        if not len(idx_arr):
            continue
        tor_idx.append(idx_arr)
        tor_params.append(np.asarray(par))
        tor_mask.append(np.asarray(msk))
        max_t = max(max_t, np.asarray(par).shape[1])

    if tor_idx:
        def widen(par, msk):
            t = par.shape[1]
            if t == max_t:
                return par, msk
            extra = max_t - t
            pad_par = np.zeros((par.shape[0], extra, 3), par.dtype)
            pad_par[:, :, 2] = 1.0
            return (
                np.concatenate([par, pad_par], axis=1),
                np.concatenate(
                    [msk, np.zeros((msk.shape[0], extra), bool)], axis=1
                ),
            )

        widened = [widen(p, m) for p, m in zip(tor_params, tor_mask)]
        idx_all = np.concatenate(tor_idx)
        par_all = np.concatenate([w[0] for w in widened])
        msk_all = np.concatenate([w[1] for w in widened])
        t_rows = _pad_rows(len(idx_all))
        pad = t_rows - len(idx_all)
        idx_all = np.concatenate([idx_all, np.tile([[0, 1, 2, 3]], (pad, 1))])
        pad_par = np.zeros((pad, max_t, 3), par_all.dtype)
        pad_par[:, :, 2] = 1.0
        par_all = np.concatenate([par_all, pad_par])
        msk_all = np.concatenate([msk_all, np.zeros((pad, max_t), bool)])

        d12 = jnp.asarray(_diff_matrix_t(n, idx_all[:, 0], idx_all[:, 1], t_rows))
        d23t = jnp.asarray(_diff_matrix_t(n, idx_all[:, 1], idx_all[:, 2], t_rows))
        d34 = jnp.asarray(_diff_matrix_t(n, idx_all[:, 2], idx_all[:, 3], t_rows))
        tor_k = jnp.asarray(par_all[:, :, 0], dtype)
        tor_phi0 = jnp.asarray(par_all[:, :, 1], dtype)
        tor_per = jnp.asarray(par_all[:, :, 2], dtype)
        tor_msk = jnp.asarray(msk_all)

    def _extract(xyz, d):
        """Per-axis bond vectors: 3 x (R, N) @ (N, A) matmuls."""
        return tuple(
            jnp.matmul(c, d, precision=mm) for c in xyz
        )

    def energy(pos: jnp.ndarray) -> jnp.ndarray:
        """Total angle+torsion energy per replica, pos (R, N, 3)."""
        pos = pos.astype(dtype)
        xyz = (pos[..., 0], pos[..., 1], pos[..., 2])  # each (R, N)
        e = jnp.zeros(pos.shape[0], dtype)
        if a_rows:
            ax, ay, az = _extract(xyz, d21)  # r21 components (R, A)
            bx, by, bz = _extract(xyz, d23)  # r23 components
            cx = ay * bz - az * by
            cy = az * bx - ax * bz
            cz = ax * by - ay * bx
            nrm = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 1e-12))
            dot = ax * bx + ay * by + az * bz
            theta = jnp.arctan2(nrm, dot)
            e = e + jnp.sum(ang_k * (theta - ang_t0) ** 2, axis=-1)
        if tor_idx:
            b1x, b1y, b1z = _extract(xyz, d12)
            b2x, b2y, b2z = _extract(xyz, d23t)
            b3x, b3y, b3z = _extract(xyz, d34)
            # n1 = b1 x b2 ; n2 = b2 x b3
            n1x = b1y * b2z - b1z * b2y
            n1y = b1z * b2x - b1x * b2z
            n1z = b1x * b2y - b1y * b2x
            n2x = b2y * b3z - b2z * b3y
            n2y = b2z * b3x - b2x * b3z
            n2z = b2x * b3y - b2y * b3x
            # sin term: (b2 . (n1 x n2)) / |b2| ; cos term: n1 . n2
            mx = n1y * n2z - n1z * n2y
            my = n1z * n2x - n1x * n2z
            mz = n1x * n2y - n1y * n2x
            b2n = jnp.sqrt(
                jnp.maximum(b2x * b2x + b2y * b2y + b2z * b2z, 1e-12)
            )
            sin_num = (b2x * mx + b2y * my + b2z * mz) / b2n
            cos_num = n1x * n2x + n1y * n2y + n1z * n2z
            phi = -jnp.arctan2(sin_num, cos_num)[..., None]  # (R, T, 1)
            amber = tor_k * (1.0 + jnp.cos(tor_per * phi - tor_phi0))
            delta = phi - tor_phi0
            delta = delta - 2.0 * jnp.pi * jnp.round(delta / (2.0 * jnp.pi))
            charmm = tor_k * delta * delta
            per_term = jnp.where(tor_per > 0, amber, charmm)
            e = e + jnp.sum(jnp.where(tor_msk, per_term, 0.0), axis=(-2, -1))
        return e

    def energy_forces(pos: jnp.ndarray):
        e, pullback = jax.vjp(energy, pos)
        (g,) = pullback(jnp.ones_like(e))
        return e, -g

    energy_forces.energy = energy
    return energy_forces
