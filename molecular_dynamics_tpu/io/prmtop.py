"""AMBER PRMTOP topology/parameter reader — plain AMBER and CHARMM-chamber.

The reference's full-representation systems load chamber-produced prmtops
(V_Calculations/Test-6_full_system: ``full_da-*.prmtop`` with %FLAG CTITLE,
CHARMM_UREY_BRADLEY, CHARMM_IMPROPERS, LENNARD_JONES_14_* sections;
Test-10_diALA: plain AMBER ``diALA-1.0.prmtop``) through a forked moleculekit
reader whose one patch widens the chamber CHARGE field (readers.py:1296-1298).
This implementation parses the %FORMAT descriptors directly, so both
flavours work unmodified, and converts straight to the dense ``FFParams``
pytree (the prmtop serves as both topology and parameter source, as in
Test-8_torsion_angle_calc/potcalc.py:165-166).

Conventions handled:
- CHARGE is stored scaled by 18.2223 (AMBER internal units),
- bond/angle/dihedral atom entries are ``3 * atom_index``; in dihedral rows a
  negative 3rd atom suppresses the 1-4 pair (multi-term duplicates / rings)
  and a negative 4th atom marks an improper,
- DIHEDRAL_PHASE is already in radians,
- LJ lookups go through NONBONDED_PARM_INDEX (1-based, ntypes x ntypes),
- chamber files add harmonic CHARMM impropers, Urey-Bradley 1-3 springs and
  dedicated 1-4 LJ tables (scnb/scee are 1.0 there).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

from molecular_dynamics_tpu import units
from molecular_dynamics_tpu.topology import Topology
from molecular_dynamics_tpu.ff.params import FFParams, finalize_ff_params

_FLAG_RE = re.compile(r"%FLAG\s+(\S+)")
_FORMAT_RE = re.compile(r"%FORMAT\((\d*)([aIEF])(\d+)(?:\.\d+)?\)", re.IGNORECASE)


def _parse_raw(path: str) -> Dict[str, np.ndarray]:
    """Parse every %FLAG section into a numpy array (str/int/float)."""
    sections: Dict[str, np.ndarray] = {}
    with open(path) as fh:
        text = fh.read()
    blocks = text.split("%FLAG")
    for block in blocks[1:]:
        lines = block.split("\n")
        name = lines[0].strip().split()[0]
        fmt_line = next((ln for ln in lines[1:] if ln.startswith("%FORMAT")), None)
        if fmt_line is None:
            continue
        m = _FORMAT_RE.match(fmt_line.strip())
        if not m:
            continue
        _, kind, width = m.group(1), m.group(2).upper(), int(m.group(3))
        data_lines = [
            ln for ln in lines[1:] if ln.strip() and not ln.startswith("%")
        ]
        if kind == "A":
            vals: List[str] = []
            for ln in data_lines:
                ln = ln.rstrip("\n")
                vals += [
                    ln[i : i + width].strip()
                    for i in range(0, len(ln.rstrip()), width)
                ]
            sections[name] = np.array(vals, object)
        else:
            tokens: List[str] = []
            for ln in data_lines:
                tokens += ln.split()
            dtype = np.int64 if kind == "I" else np.float64
            sections[name] = np.array(
                [t.replace("D", "E") for t in tokens], dtype=np.float64
            ).astype(dtype)
    return sections


def read_prmtop(path: str):
    """Read a prmtop; returns (Topology, raw-section dict)."""
    s = _parse_raw(path)
    ptr = s["POINTERS"]
    natom = int(ptr[0])

    charges = s["CHARGE"][:natom] / units.AMBER_CHARGE_FACTOR
    masses = s["MASS"][:natom]
    names = s["ATOM_NAME"][:natom]
    types = s["AMBER_ATOM_TYPE"][:natom]

    res_labels = s["RESIDUE_LABEL"]
    res_ptr = s["RESIDUE_POINTER"].astype(np.int64) - 1
    res_names = np.empty(natom, object)
    res_ids = np.zeros(natom, np.int64)
    bounds = list(res_ptr) + [natom]
    for r in range(len(res_labels)):
        res_names[bounds[r] : bounds[r + 1]] = res_labels[r]
        res_ids[bounds[r] : bounds[r + 1]] = r + 1

    def _idx(flat, width):
        arr = np.asarray(flat, np.int64).reshape(-1, width)
        return arr

    bonds_rows = np.concatenate(
        [
            _idx(s.get("BONDS_INC_HYDROGEN", []), 3),
            _idx(s.get("BONDS_WITHOUT_HYDROGEN", []), 3),
        ]
    )
    angle_rows = np.concatenate(
        [
            _idx(s.get("ANGLES_INC_HYDROGEN", []), 4),
            _idx(s.get("ANGLES_WITHOUT_HYDROGEN", []), 4),
        ]
    )
    dih_rows = np.concatenate(
        [
            _idx(s.get("DIHEDRALS_INC_HYDROGEN", []), 5),
            _idx(s.get("DIHEDRALS_WITHOUT_HYDROGEN", []), 5),
        ]
    )

    bonds = bonds_rows[:, :2] // 3
    angles = angle_rows[:, :3] // 3
    propers = dih_rows[dih_rows[:, 3] >= 0]
    impropers = dih_rows[dih_rows[:, 3] < 0]
    dihedrals = np.abs(propers[:, :4]) // 3
    improper_idx = np.abs(impropers[:, :4]) // 3

    top = Topology(
        atom_types=types.copy(),
        atom_names=names.copy(),
        res_names=res_names,
        res_ids=res_ids,
        charges=charges,
        masses=masses,
        bonds=bonds,
        angles=angles,
        dihedrals=dihedrals,
        impropers=improper_idx,
    )
    return top, s


def prmtop_to_ff_params(path: str, dtype=None) -> FFParams:
    """Build dense ``FFParams`` straight from a prmtop (both flavours)."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    top, s = read_prmtop(path)
    natom = top.n_atoms
    ptr = s["POINTERS"]
    ntypes = int(ptr[1])
    chamber = "CHARMM_IMPROPERS" in s or "FORCE_FIELD_TYPE" in s

    # --- bonds / angles with per-instance parameters ---
    def _typed(rows_h, rows_n, width):
        rows = np.concatenate(
            [
                np.asarray(s.get(rows_h, []), np.int64).reshape(-1, width),
                np.asarray(s.get(rows_n, []), np.int64).reshape(-1, width),
            ]
        )
        return rows

    bond_rows = _typed("BONDS_INC_HYDROGEN", "BONDS_WITHOUT_HYDROGEN", 3)
    bonds = bond_rows[:, :2] // 3
    bt = bond_rows[:, 2] - 1
    bond_params = np.stack(
        [s["BOND_FORCE_CONSTANT"][bt], s["BOND_EQUIL_VALUE"][bt]], axis=1
    )

    angle_rows = _typed("ANGLES_INC_HYDROGEN", "ANGLES_WITHOUT_HYDROGEN", 4)
    angles = angle_rows[:, :3] // 3
    at = angle_rows[:, 3] - 1
    angle_params = np.stack(
        [s["ANGLE_FORCE_CONSTANT"][at], s["ANGLE_EQUIL_VALUE"][at]], axis=1
    )

    # --- dihedrals: group multi-term entries by atom 4-tuple ---
    dih_rows = _typed("DIHEDRALS_INC_HYDROGEN", "DIHEDRALS_WITHOUT_HYDROGEN", 5)
    proper = dih_rows[dih_rows[:, 3] >= 0]
    improper = dih_rows[dih_rows[:, 3] < 0]

    k_arr = s["DIHEDRAL_FORCE_CONSTANT"]
    per_arr = s["DIHEDRAL_PERIODICITY"]
    phase_arr = s["DIHEDRAL_PHASE"]
    scee_arr = s.get("SCEE_SCALE_FACTOR", np.full(len(k_arr), 1.2))
    scnb_arr = s.get("SCNB_SCALE_FACTOR", np.full(len(k_arr), 2.0))

    groups: Dict[tuple, List] = {}
    order: List[tuple] = []
    pairs14: List[tuple] = []
    for row in proper:
        atoms = tuple(np.abs(row[:4]) // 3)
        t = row[4] - 1
        if atoms not in groups:
            groups[atoms] = []
            order.append(atoms)
        groups[atoms].append((k_arr[t], phase_arr[t], per_arr[t]))
        if row[2] >= 0:  # 1-4 pair not suppressed
            pairs14.append((atoms[0], atoms[3], t))

    dihedrals = np.array(order, np.int64).reshape(-1, 4)
    dihedral_terms = [groups[a] for a in order]

    # --- LJ tables through NONBONDED_PARM_INDEX ---
    type_idx = np.asarray(s["ATOM_TYPE_INDEX"], np.int64) - 1  # (natom,)
    nb_parm = np.asarray(s["NONBONDED_PARM_INDEX"], np.int64).reshape(
        ntypes, ntypes
    )
    acoef, bcoef = s["LENNARD_JONES_ACOEF"], s["LENNARD_JONES_BCOEF"]

    def _pair_table(a, b):
        ico = nb_parm[type_idx[:, None], type_idx[None, :]]
        valid = ico > 0
        idx = np.where(valid, ico - 1, 0)
        return (
            np.where(valid, a[idx], 0.0),
            np.where(valid, b[idx], 0.0),
        )

    lj_a_pair, lj_b_pair = _pair_table(acoef, bcoef)

    # --- 1-4 pairs ---
    if chamber and "LENNARD_JONES_14_ACOEF" in s:
        a14_tab, b14_tab = s["LENNARD_JONES_14_ACOEF"], s["LENNARD_JONES_14_BCOEF"]
    else:
        a14_tab, b14_tab = acoef, bcoef
    idx14 = np.array([(i, j) for i, j, _ in pairs14], np.int64).reshape(-1, 2)
    nb14 = []
    for i, j, t in pairs14:
        ico = nb_parm[type_idx[i], type_idx[j]]
        a14, b14 = (a14_tab[ico - 1], b14_tab[ico - 1]) if ico > 0 else (0.0, 0.0)
        nb14.append((a14, b14, scnb_arr[t], scee_arr[t]))
    nb14 = np.array(nb14).reshape(-1, 4)

    # --- impropers ---
    if chamber and "CHARMM_IMPROPERS" in s:
        imp_rows = np.asarray(s["CHARMM_IMPROPERS"], np.int64).reshape(-1, 5)
        imp_idx = imp_rows[:, :4] - 1  # chamber stores plain 1-based atoms
        it = imp_rows[:, 4] - 1
        ik = s["CHARMM_IMPROPER_FORCE_CONSTANT"][it]
        iph = s["CHARMM_IMPROPER_PHASE"][it]
        improper_terms = [[(k, p, 0.0)] for k, p in zip(ik, iph)]  # harmonic
    else:
        imp_idx = np.abs(improper[:, :4]) // 3
        it = improper[:, 4] - 1
        improper_terms = [
            [(k_arr[t], phase_arr[t], per_arr[t])] for t in it
        ]

    # --- chamber Urey-Bradley 1-3 springs ---
    ub_bonds = np.zeros((0, 2), np.int64)
    ub_params = np.zeros((0, 2))
    if chamber and "CHARMM_UREY_BRADLEY" in s and int(
        s.get("CHARMM_UREY_BRADLEY_COUNT", [0])[0]
    ):
        ub_rows = np.asarray(s["CHARMM_UREY_BRADLEY"], np.int64).reshape(-1, 3)
        ub_bonds = ub_rows[:, :2] - 1
        ut = ub_rows[:, 2] - 1
        ub_params = np.stack(
            [
                s["CHARMM_UREY_BRADLEY_FORCE_CONSTANT"][ut],
                s["CHARMM_UREY_BRADLEY_EQUIL_VALUE"][ut],
            ],
            axis=1,
        )

    from molecular_dynamics_tpu.solvent import attach_gb_params, infer_elements

    params = finalize_ff_params(
        masses=top.masses,
        charges=top.charges,
        bonds=bonds,
        bond_params=bond_params,
        angles=angles,
        angle_params=angle_params,
        dihedrals=dihedrals,
        dihedral_terms=dihedral_terms,
        impropers=imp_idx,
        improper_terms=improper_terms,
        idx14=idx14,
        nb14_params=nb14,
        lj_a_pair=lj_a_pair,
        lj_b_pair=lj_b_pair,
        ub_bonds=ub_bonds,
        ub_params=ub_params,
        dtype=dtype,
    )
    # GB/SASA tables (inert until "gb"/"sasa" terms are enabled)
    return attach_gb_params(
        params, elements=infer_elements(top.masses, top.atom_names)
    )
