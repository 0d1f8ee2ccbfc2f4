"""Dense force-field parameter pytree (``FFParams``)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

from molecular_dynamics_tpu import units


@struct.dataclass
class FFParams:
    """All force-field parameters for one system as dense device arrays.

    Semantics mirror torchmd's ``Parameters`` (consumed by the reference's
    TorchMD_Fix/forces.py): index tables are 0-based, parameters are in
    kcal/mol-based units, angles in radians.

    Shapes (N atoms, NB bonds, NA angles, ND dihedrals, NI impropers, T term
    padding, N14 1-4 pairs):

    - ``masses``/``charges``: (N,)
    - ``bonds`` (NB,2) + ``bond_params`` (NB,2) = [k0, d0]; E = k0 (d-d0)^2
    - ``angles`` (NA,3) + ``angle_params`` (NA,2) = [k0, theta0]
    - ``dihedrals`` (ND,4) + ``dihedral_params`` (ND,T,3) = [k0, phi0, per]
      with ``dihedral_term_mask`` (ND,T); per>0 → AMBER periodic,
      per<=0 → CHARMM harmonic (TorchMD_Fix/forces.py:565-576)
    - ``impropers`` (NI,4) + ``improper_params`` (NI,T,3) + mask
    - ``idx14`` (N14,2) + ``nb14_params`` (N14,4) = [A14, B14, scnb, scee]
    - ``lj_a_pair``/``lj_b_pair``/``qq_pair``: (N,N) pre-expanded pair tables;
      ``qq_pair`` already includes ELEC_FACTOR.
    - ``nb_mask``: (N,N) bool, True for i<j pairs not excluded by
      bonds/angles/1-4 (Forces exclusions, forces.py:37,346-355)
    - ``ub_bonds``/``ub_params``: optional CHARMM Urey-Bradley 1-3 springs
      (chamber prmtops; not evaluated by the reference, off by default)
    """

    masses: jnp.ndarray
    charges: jnp.ndarray

    bonds: jnp.ndarray
    bond_params: jnp.ndarray
    angles: jnp.ndarray
    angle_params: jnp.ndarray
    dihedrals: jnp.ndarray
    dihedral_params: jnp.ndarray
    dihedral_term_mask: jnp.ndarray
    impropers: jnp.ndarray
    improper_params: jnp.ndarray
    improper_term_mask: jnp.ndarray
    idx14: jnp.ndarray
    nb14_params: jnp.ndarray

    lj_a_pair: jnp.ndarray
    lj_b_pair: jnp.ndarray
    qq_pair: jnp.ndarray
    nb_mask: jnp.ndarray

    ub_bonds: jnp.ndarray
    ub_params: jnp.ndarray

    #: optional GB/SASA per-atom tables (attached by
    #: ``solvent.attach_gb_params``; None = implicit solvent unavailable):
    #: intrinsic Born radii (N,), HCT screening factors (N,), probe-inflated
    #: LCPO radii (N,) (0 for H), LCPO weights (N, 4)
    gb_radii: Optional[jnp.ndarray] = None
    gb_screen: Optional[jnp.ndarray] = None
    sasa_radii: Optional[jnp.ndarray] = None
    sasa_params: Optional[jnp.ndarray] = None

    #: optional CMAP cross-terms (CHARMM phi/psi correction grids,
    #: par_all27_prot_lipid_cmap.prm): ``cmap_idx`` (C, 8) atom indices of
    #: the two dihedrals, ``cmap_grid_id`` (C,) index into ``cmap_coeffs``
    #: (M, G, G, 4, 4) — per-cell bicubic coefficients precomputed from the
    #: periodic grids (inert until "cmap" is in EnergyConfig.terms)
    cmap_idx: Optional[jnp.ndarray] = None
    cmap_grid_id: Optional[jnp.ndarray] = None
    cmap_coeffs: Optional[jnp.ndarray] = None

    @property
    def n_atoms(self) -> int:
        return self.masses.shape[0]

    @property
    def has_gb(self) -> bool:
        return self.gb_radii is not None

    @property
    def has_cmap(self) -> bool:
        return self.cmap_idx is not None and self.cmap_idx.shape[0] > 0


def _pad_terms(term_lists: Sequence[Sequence[Sequence[float]]], dtype):
    """Pad ragged per-torsion term lists to (n, max_terms, 3) + mask.

    Padding rows get per=1, k0=0 so they are inert under either torsion
    branch (AMBER cos term with k0=0 contributes nothing even unmasked).
    """
    n = len(term_lists)
    if n == 0:
        return (
            np.zeros((0, 1, 3), dtype),
            np.zeros((0, 1), bool),
        )
    max_t = max(1, max(len(t) for t in term_lists))
    params = np.zeros((n, max_t, 3), dtype)
    params[:, :, 2] = 1.0  # per=1 on padding
    mask = np.zeros((n, max_t), bool)
    for i, terms in enumerate(term_lists):
        for j, (k0, phi0, per) in enumerate(terms):
            params[i, j] = (k0, phi0, per)
            mask[i, j] = True
    return params, mask


def bicubic_coefficients(grid: np.ndarray) -> np.ndarray:
    """Per-cell bicubic coefficients for a periodic 2D grid, (G, G, 4, 4).

    The CHARMM/NAMD CMAP evaluation scheme: grid-point derivatives by
    centered finite differences on the periodic grid, then the standard
    bicubic coefficient solve per cell so the surface is C1-continuous and
    interpolates the node values exactly. Cell-local coordinates t, u in
    [0, 1); E(t, u) = sum_mn A[m, n] t^m u^n.
    """
    f = np.asarray(grid, np.float64)
    fx = (np.roll(f, -1, 0) - np.roll(f, 1, 0)) / 2.0
    fy = (np.roll(f, -1, 1) - np.roll(f, 1, 1)) / 2.0
    fxy = (
        np.roll(np.roll(f, -1, 0), -1, 1)
        - np.roll(np.roll(f, -1, 0), 1, 1)
        - np.roll(np.roll(f, 1, 0), -1, 1)
        + np.roll(np.roll(f, 1, 0), 1, 1)
    ) / 4.0

    def corners(a):
        return (
            a,
            np.roll(a, -1, 0),
            np.roll(a, -1, 1),
            np.roll(np.roll(a, -1, 0), -1, 1),
        )

    f00, f10, f01, f11 = corners(f)
    fx00, fx10, fx01, fx11 = corners(fx)
    fy00, fy10, fy01, fy11 = corners(fy)
    fxy00, fxy10, fxy01, fxy11 = corners(fxy)
    fmat = np.stack(
        [
            np.stack([f00, f01, fy00, fy01], -1),
            np.stack([f10, f11, fy10, fy11], -1),
            np.stack([fx00, fx01, fxy00, fxy01], -1),
            np.stack([fx10, fx11, fxy10, fxy11], -1),
        ],
        -2,
    )  # (G, G, 4, 4)
    b = np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [-3, 3, -2, -1], [2, -2, 1, 1]],
        np.float64,
    )
    return np.einsum("mp,ijpq,nq->ijmn", b, fmat, b)


def attach_cmap_params(
    params: "FFParams", cmap_idx: np.ndarray, grids: Sequence[np.ndarray],
    grid_id: np.ndarray, dtype=None,
) -> "FFParams":
    """Return a copy of ``params`` carrying CMAP tables (inert until the
    "cmap" energy term is enabled)."""
    import dataclasses

    if dtype is None:
        dtype = params.masses.dtype
    coeffs = np.stack([bicubic_coefficients(g) for g in grids])
    return dataclasses.replace(
        params,
        cmap_idx=jnp.asarray(np.asarray(cmap_idx, np.int32).reshape(-1, 8)),
        cmap_grid_id=jnp.asarray(np.asarray(grid_id, np.int32)),
        cmap_coeffs=jnp.asarray(coeffs, dtype),
    )


def _exclusion_mask(
    n_atoms: int,
    bonds: np.ndarray,
    angles: np.ndarray,
    idx14: np.ndarray,
    exclusions: Sequence[str] = ("bonds", "angles", "1-4"),
) -> np.ndarray:
    """Upper-triangular all-vs-all pair mask minus excluded pairs.

    Matches torchmd ``Parameters.get_exclusions`` + ``Forces._make_indeces``
    (TorchMD_Fix/forces.py:346-355): excluded are bonded pairs, angle 1-3
    pairs and dihedral 1-4 pairs.
    """
    mask = np.triu(np.ones((n_atoms, n_atoms), bool), k=1)
    pairs = []
    if "bonds" in exclusions and len(bonds):
        pairs.append(np.asarray(bonds)[:, :2])
    if "angles" in exclusions and len(angles):
        pairs.append(np.asarray(angles)[:, [0, 2]])
    if "1-4" in exclusions and len(idx14):
        pairs.append(np.asarray(idx14))
    for p in pairs:
        mask[p[:, 0], p[:, 1]] = False
        mask[p[:, 1], p[:, 0]] = False
    return np.triu(mask, k=1)


def finalize_ff_params(
    *,
    masses: np.ndarray,
    charges: np.ndarray,
    bonds: np.ndarray,
    bond_params: np.ndarray,
    angles: np.ndarray,
    angle_params: np.ndarray,
    dihedrals: np.ndarray,
    dihedral_terms: Sequence[Sequence[Sequence[float]]],
    impropers: np.ndarray,
    improper_terms: Sequence[Sequence[Sequence[float]]],
    idx14: np.ndarray,
    nb14_params: np.ndarray,
    lj_a_pair: np.ndarray,
    lj_b_pair: np.ndarray,
    exclusions: Sequence[str] = ("bonds", "angles", "1-4"),
    ub_bonds: Optional[np.ndarray] = None,
    ub_params: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> FFParams:
    """Assemble an ``FFParams`` pytree from host-side numpy tables."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    n = len(masses)
    charges = np.asarray(charges, np_dtype)
    qq = units.ELEC_FACTOR * charges[:, None] * charges[None, :]

    dih_params, dih_mask = _pad_terms(dihedral_terms, np_dtype)
    imp_params, imp_mask = _pad_terms(improper_terms, np_dtype)

    bonds = np.asarray(bonds, np.int32).reshape(-1, 2)
    angles = np.asarray(angles, np.int32).reshape(-1, 3)
    dihedrals = np.asarray(dihedrals, np.int32).reshape(-1, 4)
    impropers = np.asarray(impropers, np.int32).reshape(-1, 4)
    idx14 = np.asarray(idx14, np.int32).reshape(-1, 2)

    nb_mask = _exclusion_mask(n, bonds, angles, idx14, exclusions)

    if ub_bonds is None:
        ub_bonds = np.zeros((0, 2), np.int32)
        ub_params = np.zeros((0, 2), np_dtype)

    as_dev = lambda a, dt: jnp.asarray(np.asarray(a), dt)
    return FFParams(
        masses=as_dev(masses, dtype),
        charges=as_dev(charges, dtype),
        bonds=as_dev(bonds, jnp.int32),
        bond_params=as_dev(np.asarray(bond_params, np_dtype).reshape(-1, 2), dtype),
        angles=as_dev(angles, jnp.int32),
        angle_params=as_dev(np.asarray(angle_params, np_dtype).reshape(-1, 2), dtype),
        dihedrals=as_dev(dihedrals, jnp.int32),
        dihedral_params=as_dev(dih_params, dtype),
        dihedral_term_mask=as_dev(dih_mask, jnp.bool_),
        impropers=as_dev(impropers, jnp.int32),
        improper_params=as_dev(imp_params, dtype),
        improper_term_mask=as_dev(imp_mask, jnp.bool_),
        idx14=as_dev(idx14, jnp.int32),
        nb14_params=as_dev(np.asarray(nb14_params, np_dtype).reshape(-1, 4), dtype),
        lj_a_pair=as_dev(lj_a_pair, dtype),
        lj_b_pair=as_dev(lj_b_pair, dtype),
        qq_pair=as_dev(qq, dtype),
        nb_mask=as_dev(nb_mask, jnp.bool_),
        ub_bonds=as_dev(ub_bonds, jnp.int32),
        ub_params=as_dev(ub_params, dtype),
    )


def tile_ff_params(ff: FFParams, m: int) -> FFParams:
    """Tile a system ``m`` times into one composite ``FFParams``.

    Every bonded table is repeated with per-copy atom-index offsets; the
    nonbonded pair tables tile as (m*N, m*N) blocks — cross-copy entries
    are the true type-pair LJ/Coulomb values (they depend only on the two
    atom types), and the exclusion mask excludes nothing between copies.
    Per-atom GB/SASA tables and CMAP cross-terms tile alongside.

    This is the scalability surface the reference never had (every
    reference script is a single 40/104-atom molecule): a tiled system
    exercises every kernel tier at m-fold atom count while keeping an
    exact oracle — with copies placed far apart, the composite energy is
    m times the single-copy energy plus (cutoff-suppressed) cross terms.
    """
    import dataclasses

    n = ff.n_atoms
    offs = np.arange(m, dtype=np.int32) * n

    def tile_idx(tab):
        tab = np.asarray(tab)
        if tab.shape[0] == 0:
            return jnp.asarray(tab)
        out = np.concatenate([tab + k for k in offs])
        return jnp.asarray(out, np.int32)

    def tile_rows(tab):
        tab = np.asarray(tab)
        return jnp.asarray(np.concatenate([tab] * m)) if tab.shape[0] \
            else jnp.asarray(tab)

    def tile_pair(tab):
        return jnp.asarray(np.tile(np.asarray(tab), (m, m)))

    nb = np.triu(np.ones((m * n, m * n), bool), k=1)
    base_mask = np.asarray(ff.nb_mask)
    for k in range(m):
        nb[k * n : (k + 1) * n, k * n : (k + 1) * n] = base_mask

    opt = {}
    for name in ("gb_radii", "gb_screen", "sasa_radii", "sasa_params"):
        v = getattr(ff, name)
        opt[name] = tile_rows(v) if v is not None else None
    if ff.cmap_idx is not None:
        opt["cmap_idx"] = tile_idx(ff.cmap_idx)
        opt["cmap_grid_id"] = tile_rows(ff.cmap_grid_id)
        opt["cmap_coeffs"] = ff.cmap_coeffs

    return dataclasses.replace(
        ff,
        masses=tile_rows(ff.masses),
        charges=tile_rows(ff.charges),
        bonds=tile_idx(ff.bonds),
        bond_params=tile_rows(ff.bond_params),
        angles=tile_idx(ff.angles),
        angle_params=tile_rows(ff.angle_params),
        dihedrals=tile_idx(ff.dihedrals),
        dihedral_params=tile_rows(ff.dihedral_params),
        dihedral_term_mask=tile_rows(ff.dihedral_term_mask),
        impropers=tile_idx(ff.impropers),
        improper_params=tile_rows(ff.improper_params),
        improper_term_mask=tile_rows(ff.improper_term_mask),
        idx14=tile_idx(ff.idx14),
        nb14_params=tile_rows(ff.nb14_params),
        lj_a_pair=tile_pair(ff.lj_a_pair),
        lj_b_pair=tile_pair(ff.lj_b_pair),
        qq_pair=tile_pair(ff.qq_pair),
        nb_mask=jnp.asarray(nb),
        ub_bonds=tile_idx(ff.ub_bonds),
        ub_params=tile_rows(ff.ub_params),
        **opt,
    )
