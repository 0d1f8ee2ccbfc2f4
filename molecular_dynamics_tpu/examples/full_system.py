"""Packaged full-representation example systems (npz fixtures).

``decaalanine_full()`` — the 104-atom all-atom deca-alanine the reference's
Full_Representation GAN variants train on (chamber prmtop path, SURVEY.md
§2.6; fixture extracted through this repo's own prmtop/pdb parsers by
scripts/extract_fixtures.py). ``dialanine()`` — the 22-atom AMBER di-alanine
side case (Test-10_diALA).
"""

from __future__ import annotations

import pathlib
from typing import Tuple

import numpy as np

from molecular_dynamics_tpu.ff.params import FFParams

_DATA = pathlib.Path(__file__).parent / "data"

_FF_FIELDS = (
    "masses", "charges", "bonds", "bond_params", "angles", "angle_params",
    "dihedrals", "dihedral_params", "dihedral_term_mask", "impropers",
    "improper_params", "improper_term_mask", "idx14", "nb14_params",
    "lj_a_pair", "lj_b_pair", "qq_pair", "nb_mask", "ub_bonds", "ub_params",
)

_INT_FIELDS = {"bonds", "angles", "dihedrals", "impropers", "idx14", "ub_bonds"}
_BOOL_FIELDS = {"dihedral_term_mask", "improper_term_mask", "nb_mask"}


def _load(name: str, dtype=None) -> Tuple[FFParams, np.ndarray, dict]:
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    path = _DATA / f"{name}.npz"
    if not path.exists():
        raise FileNotFoundError(
            f"{path} missing — run scripts/extract_fixtures.py once with the "
            "reference data mounted, or install a release wheel."
        )
    raw = np.load(path, allow_pickle=False)
    leaves = {}
    for k in _FF_FIELDS:
        arr = raw[f"ff_{k}"]
        if k in _INT_FIELDS:
            leaves[k] = jnp.asarray(arr, jnp.int32)
        elif k in _BOOL_FIELDS:
            leaves[k] = jnp.asarray(arr, jnp.bool_)
        else:
            leaves[k] = jnp.asarray(arr, dtype)
    meta = {
        k: raw[k]
        for k in ("atom_names", "atom_types", "res_ids", "res_names")
    }
    from molecular_dynamics_tpu.solvent import attach_gb_params, infer_elements

    ff = attach_gb_params(
        FFParams(**leaves),
        elements=infer_elements(leaves["masses"], meta["atom_names"]),
    )
    return ff, raw["coords"], meta


def decaalanine_full(dtype=None) -> Tuple[FFParams, np.ndarray, dict]:
    """104-atom all-atom deca-alanine: (FFParams, start coords, metadata)."""
    return _load("full_da", dtype)


def dialanine(dtype=None) -> Tuple[FFParams, np.ndarray, dict]:
    """22-atom AMBER di-alanine: (FFParams, start coords, metadata)."""
    return _load("diala", dtype)


def tiled_decaalanine(
    m: int, spacing: float = 50.0, dtype=None
) -> Tuple[FFParams, np.ndarray, dict]:
    """``m`` non-bonded copies of the 104-atom deca-alanine as ONE system.

    Copies are spaced ``spacing`` A apart along x, so with a finite cutoff
    the composite energy is ~m x the single-copy energy — an exact oracle
    for validating every kernel tier at m-fold atom count (the reference
    never exceeds 104 atoms; this is the scalability surface).
    """
    from molecular_dynamics_tpu.ff.params import tile_ff_params

    ff, coords, meta = decaalanine_full(dtype)
    big = tile_ff_params(ff, m)
    shifted = np.concatenate([
        np.asarray(coords) + np.array([k * spacing, 0.0, 0.0], coords.dtype)
        for k in range(m)
    ])
    meta = dict(meta)
    for k in ("atom_names", "atom_types", "res_names"):
        meta[k] = list(meta[k]) * m
    rid = np.asarray(meta["res_ids"])
    span = int(rid.max()) + 1 if rid.size else 1
    meta["res_ids"] = np.concatenate([rid + k * span for k in range(m)])
    meta["tiled_copies"] = m
    return big, shifted, meta
