"""Differentiable geometry features shared by models and losses.

Collects the geometric machinery the reference re-implements per experiment
(SURVEY.md §7.6): torsion φ/ψ extraction (Test-8 potcalc.py:103-147 and the
hard-coded index tables of LSTM_V6/lstm.py:115-166), pairwise distance
matrices with banded kNN masks (lstm.py:169-194), Kabsch rigid alignment and
batch RMSD (cGAN pretrain-3.1.0 cgan.py:298-355), and end-to-end distances.
All functions are pure JAX: differentiable, vmap-able, jit-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from molecular_dynamics_tpu.energy import dihedral_angles
from molecular_dynamics_tpu.topology import Topology

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# backbone torsion index tables (host-side, from topology)
# ---------------------------------------------------------------------------


def phi_psi_indices(top: Topology) -> Tuple[np.ndarray, np.ndarray]:
    """Backbone φ/ψ dihedral index tables from atom names.

    φ(i) = C(i-1)-N(i)-CA(i)-C(i); ψ(i) = N(i)-CA(i)-C(i)-N(i+1).
    Generalises the reference's hard-coded tables (LSTM_V6/lstm.py:115-166)
    to any topology with standard backbone atom names.
    """
    by_res = {}
    for i, (r, nm) in enumerate(zip(top.res_ids, top.atom_names)):
        by_res.setdefault(int(r), {})[str(nm)] = i
    res = sorted(by_res)
    phis, psis = [], []
    for k, r in enumerate(res):
        cur = by_res[r]
        if k > 0:
            prev = by_res[res[k - 1]]
            if all(n in cur for n in ("N", "CA", "C")) and "C" in prev:
                phis.append((prev["C"], cur["N"], cur["CA"], cur["C"]))
        if k + 1 < len(res):
            nxt = by_res[res[k + 1]]
            if all(n in cur for n in ("N", "CA", "C")) and "N" in nxt:
                psis.append((cur["N"], cur["CA"], cur["C"], nxt["N"]))
    return (
        np.array(phis, np.int64).reshape(-1, 4),
        np.array(psis, np.int64).reshape(-1, 4),
    )


def phi_psi(pos: Array, phi_idx, psi_idx) -> Tuple[Array, Array]:
    """Backbone torsion values (rad) for one frame (or vmap for batches)."""
    return (
        dihedral_angles(pos, jnp.asarray(phi_idx)),
        dihedral_angles(pos, jnp.asarray(psi_idx)),
    )


def per_atom_angle_rows(top: Topology):
    """Map every atom to its residue's row in the φ/ψ tables.

    Returns ``(phi_idx, psi_idx, phi_row, psi_row)`` where ``phi_row[a]``
    is the row of ``phi_idx`` carrying atom ``a``'s residue's φ (or -1 at
    the terminus without one; ψ likewise). Broadcasting torsions to atoms
    builds the per-particle [xyz, φ, ψ] features the graph-conditioned
    sequence families train on (Seq2Seq_Graph_Position_V1/lstm.py:17-25,
    allPhiPsi concatenated per particle).
    """
    phi_idx, psi_idx = phi_psi_indices(top)
    res = np.asarray(top.res_ids)
    # the torsion's own residue: φ row is (C-, N, CA, C) -> CA at col 2;
    # ψ row is (N, CA, C, N+) -> CA at col 1
    phi_of_res = {int(res[r[2]]): k for k, r in enumerate(phi_idx)}
    psi_of_res = {int(res[r[1]]): k for k, r in enumerate(psi_idx)}
    phi_row = np.array([phi_of_res.get(int(r), -1) for r in res], np.int64)
    psi_row = np.array([psi_of_res.get(int(r), -1) for r in res], np.int64)
    return phi_idx, psi_idx, phi_row, psi_row


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------


def distance_matrix(pos: Array) -> Array:
    """Dense pairwise distance matrix (N, N), grad-safe at the diagonal."""
    delta = pos[..., :, None, :] - pos[..., None, :, :]
    sq = jnp.sum(delta * delta, axis=-1)
    eye = jnp.eye(pos.shape[-2], dtype=bool)
    return jnp.sqrt(jnp.where(eye, 1.0, sq)) * (~eye)


def knn_mask(n_atoms: int, k: int) -> jnp.ndarray:
    """Banded |i-j| <= k mask excluding the diagonal — the reference's
    sequence-local distance-loss mask (LSTM_V6/lstm.py:183-194)."""
    idx = jnp.arange(n_atoms)
    band = jnp.abs(idx[:, None] - idx[None, :]) <= k
    return band & ~jnp.eye(n_atoms, dtype=bool)


def knn_graph_mask(pos: Array, k: int) -> Array:
    """Spatial k-nearest-neighbour adjacency (N, N) bool, per frame — the
    dense equivalent of torch-geometric's KNNGraph(k) used by the GAT
    simulators (Single_Graph_GAT_V8/single_graph_gat.py:228-232)."""
    d = distance_matrix(pos)
    n = pos.shape[-2]
    d = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)
    # mark the k smallest distances per row
    kth = jnp.sort(d, axis=-1)[..., k - 1 : k]
    return d <= kth


# ---------------------------------------------------------------------------
# rigid alignment / RMSD
# ---------------------------------------------------------------------------


def kabsch_align(a: Array, b: Array) -> Tuple[Array, Array]:
    """Optimal rotation R and translation t with R @ a_c + t ≈ b.

    Differentiable Kabsch via SVD, the reference's ``find_rigid_alignment``
    (cgan.py:298-332). Returns (R (3,3), t (3,)).
    """
    a_c = a - jnp.mean(a, axis=0, keepdims=True)
    b_c = b - jnp.mean(b, axis=0, keepdims=True)
    h = a_c.T @ b_c
    u, s, vt = jnp.linalg.svd(h, full_matrices=False)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    corr = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(d))
    r = vt.T @ corr @ u.T
    t = jnp.mean(b, axis=0) - r @ jnp.mean(a, axis=0)
    return r, t


def aligned_rmsd(a: Array, b: Array) -> Array:
    """RMSD after optimal superposition (batch via vmap) — the reference's
    batch_rmsd pretraining loss (cgan.py:335-355)."""
    r, t = kabsch_align(a, b)
    diff = (a @ r.T + t) - b
    return jnp.sqrt(jnp.mean(jnp.sum(diff * diff, axis=-1)) + 1e-12)


def rmsd(a: Array, b: Array) -> Array:
    """Plain (unaligned) RMSD."""
    diff = a - b
    return jnp.sqrt(jnp.mean(jnp.sum(diff * diff, axis=-1)) + 1e-12)


# ---------------------------------------------------------------------------
# normalization helpers (dataset scaling)
# ---------------------------------------------------------------------------


def minmax_fit(frames: Array) -> Tuple[Array, Array]:
    """Per-axis min/max over a trajectory batch (cFlow cflow.py:203-211)."""
    lo = jnp.min(frames, axis=tuple(range(frames.ndim - 1)))
    hi = jnp.max(frames, axis=tuple(range(frames.ndim - 1)))
    return lo, hi


def minmax_scale(x: Array, lo: Array, hi: Array) -> Array:
    return (x - lo) / (hi - lo + 1e-12)


def minmax_unscale(x: Array, lo: Array, hi: Array) -> Array:
    return x * (hi - lo + 1e-12) + lo
