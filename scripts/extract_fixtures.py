#!/usr/bin/env python
"""Extract self-contained example-system fixtures from reference data files.

Reads the chamber prmtop + start coordinates of the reference's full-
representation deca-alanine (V_Calculations/Test-6_full_system/data:
full_da-1.3.prmtop + smd_ini.pdb — the 104-atom system every
Full_Representation GAN variant trains on) and the di-alanine side case
(Test-10_diALA), through this repo's own parsers, and stores the resulting
dense parameter pytrees + coordinates as .npz fixtures so benchmarks, tests
and examples run without the reference mount.

Pure parameter/coordinate data (force-field constants and a starting
structure) — no code is copied.

Usage: python scripts/extract_fixtures.py
"""

import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from molecular_dynamics_tpu.io import prmtop_to_ff_params, read_prmtop, read_pdb

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parents[1] / (
    "molecular_dynamics_tpu/examples/data"
)

SYSTEMS = {
    "full_da": (
        REF / "V_Calculations/Test-6_full_system/data/full_da-1.3.prmtop",
        REF / "V_Calculations/Test-6_full_system/data/smd_ini.pdb",
    ),
    "diala": (
        REF / "V_Calculations/Test-10_diALA/data/diALA-1.0.prmtop",
        REF / "V_Calculations/Test-10_diALA/data/alad.pdb",
    ),
}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, (prmtop, pdb) in SYSTEMS.items():
        ff = prmtop_to_ff_params(str(prmtop))
        top, _ = read_prmtop(str(prmtop))
        coords, pdb_names, _, _ = read_pdb(str(pdb))
        assert coords.shape[0] == ff.n_atoms, (name, coords.shape, ff.n_atoms)
        # sanity: pdb ordering matches prmtop ordering
        mismatch = sum(
            1 for a, b in zip(pdb_names, top.atom_names) if str(a) != str(b)
        )
        assert mismatch == 0, f"{name}: {mismatch} atom-name mismatches"

        arrays = {
            f"ff_{k}": np.asarray(getattr(ff, k))
            for k in (
                "masses", "charges", "bonds", "bond_params", "angles",
                "angle_params", "dihedrals", "dihedral_params",
                "dihedral_term_mask", "impropers", "improper_params",
                "improper_term_mask", "idx14", "nb14_params", "lj_a_pair",
                "lj_b_pair", "qq_pair", "nb_mask", "ub_bonds", "ub_params",
            )
        }
        arrays["coords"] = np.asarray(coords, np.float64)
        arrays["atom_names"] = np.asarray([str(s) for s in top.atom_names])
        arrays["atom_types"] = np.asarray([str(s) for s in top.atom_types])
        arrays["res_ids"] = np.asarray(top.res_ids)
        arrays["res_names"] = np.asarray([str(s) for s in top.res_names])
        np.savez_compressed(OUT / f"{name}.npz", **arrays)
        print(f"{name}: {ff.n_atoms} atoms -> {OUT / (name + '.npz')}")


if __name__ == "__main__":
    main()
