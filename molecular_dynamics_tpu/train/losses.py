"""Physics-informed and geometric training losses (all batched, all jit).

Gathers the loss machinery the reference re-implements per experiment:
potential-energy losses with per-term weights (HNN-Full.py:220-258, GAN
informed updates), SMD-bias losses (GAN_V17.12/gan.py:332-361), distance-
matrix and kNN-masked distance losses (GAN_V37/gan.py:449-451,
LSTM_V6/lstm.py:169-194,226), torsion-angle losses, and Kabsch-RMSD
pretraining losses (Pretrain_Backbone_RMSD_JV-3.0.4/pretrain.py:404-461).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from molecular_dynamics_tpu.energy import (
    EnergyConfig,
    REFERENCE_CONFIG,
    energy_terms,
    dihedral_angles,
)
from molecular_dynamics_tpu.ff.params import FFParams
from molecular_dynamics_tpu.features import distance_matrix, aligned_rmsd

Array = jnp.ndarray


def potential_loss(
    coords: Array,  # (batch, N, 3)
    ff: FFParams,
    config: EnergyConfig = REFERENCE_CONFIG,
    term_weights: Optional[Dict[str, float]] = None,
) -> Array:
    """Mean (optionally per-term-weighted) potential energy of a batch.

    One vmapped evaluation replaces the reference's per-sample Energy calls
    (GAN_V37/gan.py:649-667). With ``term_weights`` this is the HNN's
    weighted-term regulariser (HNN-Full.py:236-258).
    """

    def single(pos):
        terms = energy_terms(pos, ff, config=config)
        if term_weights is None:
            return sum(terms.values())
        return sum(terms[k] * w for k, w in term_weights.items())

    return jnp.mean(jax.vmap(single)(coords))


def bias_energy_loss(coords: Array, bias, steps: Array) -> Array:
    """Mean SMD-bias energy of generated structures at their times — the
    force-bias loss term (GAN_V17.12/gan.py:332-361)."""
    return jnp.mean(jax.vmap(bias.energy)(coords, steps))


def distance_matrix_loss(
    pred: Array, target: Array, mask: Optional[Array] = None
) -> Array:
    """MSE between pairwise distance matrices (GAN_V37/gan.py:449-451);
    with ``mask`` (N, N) it becomes the banded kNN loss (lstm.py:183-194)."""
    dp = jax.vmap(distance_matrix)(pred)
    dt = jax.vmap(distance_matrix)(target)
    se = (dp - dt) ** 2
    if mask is not None:
        return jnp.sum(se * mask) / (jnp.sum(mask) * pred.shape[0] + 1e-12)
    return jnp.mean(se)


def torsion_loss(pred: Array, target: Array, idx: Array) -> Array:
    """MSE over torsion angles of two coordinate batches, with periodic
    wrapping of the difference."""
    pp = jax.vmap(lambda p: dihedral_angles(p, idx))(pred)
    tt = jax.vmap(lambda p: dihedral_angles(p, idx))(target)
    d = pp - tt
    d = d - 2 * jnp.pi * jnp.round(d / (2 * jnp.pi))
    return jnp.mean(d * d)


def rmsd_loss(pred: Array, target: Array) -> Array:
    """Mean Kabsch-aligned RMSD over a batch (pretrain.py:404-461)."""
    return jnp.mean(jax.vmap(aligned_rmsd)(pred, target))


def window_composite_loss(
    pred: Array,
    target: Array,
    phi_idx: Array,
    psi_idx: Array,
    knn: Array,
    w_pos: float = 1.0,
    w_phi: float = 1.0,
    w_psi: float = 1.0,
    w_dist: float = 1.0,
) -> Array:
    """The LSTM_V6 composite: position MSE + phi MSE + psi MSE + kNN-masked
    distance-matrix MSE (lstm.py:226)."""
    pos_mse = jnp.mean((pred - target) ** 2)
    return (
        w_pos * pos_mse
        + w_phi * torsion_loss(pred, target, phi_idx)
        + w_psi * torsion_loss(pred, target, psi_idx)
        + w_dist * distance_matrix_loss(pred, target, knn)
    )
