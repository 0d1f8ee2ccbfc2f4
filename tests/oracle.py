"""Independent numpy oracle for force-field energies (float64).

Implements the classical force-field math exactly as the reference's TorchMD
engine evaluates it (TorchMD_Fix/forces.py; formulas documented in SURVEY.md
§2.1) but as a *pair-list based*, pure-numpy program — deliberately a
different code structure from the dense-matrix JAX implementation under test,
so shared-bug risk is low. This stands in for "parity vs TorchMD" since
torchmd itself is not installable here; the math (including the reaction
field constants, the cubic switching polynomial, the -atan2 torsion sign
convention, scnb/scee 1-4 scaling and the exclusion rules) follows the
reference line-by-line.
"""

from __future__ import annotations

import math

import numpy as np

ELEC_FACTOR = 332.0637132991921  # kcal/mol*A/e^2, matches mdx.units to 1e-10


def _as_np(ff):
    return {k: np.asarray(getattr(ff, k)) for k in (
        "masses", "charges", "bonds", "bond_params", "angles", "angle_params",
        "dihedrals", "dihedral_params", "dihedral_term_mask",
        "impropers", "improper_params", "improper_term_mask",
        "idx14", "nb14_params", "lj_a_pair", "lj_b_pair", "nb_mask",
        "ub_bonds", "ub_params",
    )}


def _torsion_phi(p0, p1, p2, p3):
    """Reference-literal dihedral (forces.py:540-551): crossC construction,
    phi = -atan2(sinPhi, cosPhi)."""
    r12 = p0 - p1
    r23 = p1 - p2
    r34 = p2 - p3
    crossA = np.cross(r12, r23)
    crossB = np.cross(r23, r34)
    crossC = np.cross(r23, crossA)
    normA = np.linalg.norm(crossA, axis=-1)
    normB = np.linalg.norm(crossB, axis=-1)
    normC = np.linalg.norm(crossC, axis=-1)
    ncb = crossB / normB[..., None]
    cos_phi = np.sum(crossA * ncb, axis=-1) / normA
    sin_phi = np.sum(crossC * ncb, axis=-1) / normC
    return -np.arctan2(sin_phi, cos_phi)


def _torsion_term_energy(phi, params, mask):
    """Sum multi-term torsion energy with the per>0 AMBER / else CHARMM
    branch (forces.py:565-576)."""
    total = 0.0
    n, t, _ = params.shape
    for i in range(n):
        for j in range(t):
            if not mask[i, j]:
                continue
            k0, phi0, per = params[i, j]
            if per > 0:
                total += k0 * (1.0 + math.cos(per * phi[i] - phi0))
            else:
                d = phi[i] - phi0
                while d < -math.pi:
                    d += 2 * math.pi
                while d > math.pi:
                    d -= 2 * math.pi
                total += k0 * d * d
    return total


def oracle_energy(
    pos,
    ff,
    cutoff=9.0,
    rfa=True,
    switch_dist=7.5,
    solvent_dielectric=78.5,
):
    """Per-term energies dict for one frame (N, 3), float64."""
    f = _as_np(ff)
    pos = np.asarray(pos, np.float64)
    out = {}

    # bonds
    b = f["bonds"]
    if len(b):
        d = np.linalg.norm(pos[b[:, 0]] - pos[b[:, 1]], axis=1)
        k0, d0 = f["bond_params"].T
        out["bonds"] = float(np.sum(k0 * (d - d0) ** 2))

    # angles (arccos of clamped cosine, forces.py:504-517)
    a = f["angles"]
    if len(a):
        r21 = pos[a[:, 0]] - pos[a[:, 1]]
        r23 = pos[a[:, 2]] - pos[a[:, 1]]
        cos_t = np.sum(r21 * r23, axis=1) / (
            np.linalg.norm(r21, axis=1) * np.linalg.norm(r23, axis=1)
        )
        theta = np.arccos(np.clip(cos_t, -1.0, 1.0))
        k0, t0 = f["angle_params"].T
        out["angles"] = float(np.sum(k0 * (theta - t0) ** 2))

    # dihedrals / impropers
    for key, idx_key, par_key, mask_key in (
        ("dihedrals", "dihedrals", "dihedral_params", "dihedral_term_mask"),
        ("impropers", "impropers", "improper_params", "improper_term_mask"),
    ):
        idx = f[idx_key]
        if len(idx):
            phi = _torsion_phi(
                pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]], pos[idx[:, 3]]
            )
            out[key] = _torsion_term_energy(phi, f[par_key], f[mask_key])

    # 1-4 scaled LJ + Coulomb (forces.py:176-226)
    lj14 = elec14 = 0.0
    i14 = f["idx14"]
    if len(i14):
        d = np.linalg.norm(pos[i14[:, 0]] - pos[i14[:, 1]], axis=1)
        a14, b14, scnb, scee = f["nb14_params"].T
        lj14 = float(np.sum((a14 / d**12 - b14 / d**6) / scnb))
        q = f["charges"]
        elec14 = float(
            np.sum(ELEC_FACTOR * q[i14[:, 0]] * q[i14[:, 1]] / d / scee)
        )

    # nonbonded over the surviving pair list (forces.py:258-316)
    mask = f["nb_mask"]
    ii, jj = np.where(mask)
    d = np.linalg.norm(pos[ii] - pos[jj], axis=1)
    if cutoff is not None:
        keep = d <= cutoff
        ii, jj, d = ii[keep], jj[keep], d[keep]
    q = f["charges"]
    if rfa and cutoff is not None:
        denom = 2 * solvent_dielectric + 1
        krf = (1 / cutoff**3) * (solvent_dielectric - 1) / denom
        crf = (1 / cutoff) * (3 * solvent_dielectric) / denom
        elec = np.sum(
            ELEC_FACTOR * q[ii] * q[jj] * (1.0 / d + krf * d**2 - crf)
        )
    else:
        elec = np.sum(ELEC_FACTOR * q[ii] * q[jj] / d)
    aa = f["lj_a_pair"][ii, jj]
    bb = f["lj_b_pair"][ii, jj]
    pot = aa / d**12 - bb / d**6
    if switch_dist is not None and cutoff is not None:
        over = d > switch_dist
        t = (d[over] - switch_dist) / (cutoff - switch_dist)
        pot[over] *= 1 + t**3 * (-10 + t * (15 - t * 6))
    out["lj"] = float(np.sum(pot)) + lj14
    out["electrostatics"] = float(elec) + elec14

    # chamber Urey-Bradley
    ub = f["ub_bonds"]
    if len(ub):
        d = np.linalg.norm(pos[ub[:, 0]] - pos[ub[:, 1]], axis=1)
        k0, d0 = f["ub_params"].T
        out["urey_bradley"] = float(np.sum(k0 * (d - d0) ** 2))
    return out


# ---------------------------------------------------------------------------
# implicit solvent (GB-OBC II + LCPO SASA), scalar-loop formulation
# ---------------------------------------------------------------------------

GB_OFFSET = 0.09
KAPPA_FACTOR = 50.29216


def oracle_born_radii(pos, ff):
    """HCT descreening + OBC II tanh rescaling, explicit python loops."""
    pos = np.asarray(pos, np.float64)
    radii = np.asarray(ff.gb_radii, np.float64)
    screen = np.asarray(ff.gb_screen, np.float64)
    n = len(radii)
    rho = radii - GB_OFFSET
    born = np.zeros(n)
    for i in range(n):
        acc = 0.0
        for j in range(n):
            if j == i:
                continue
            d = float(np.linalg.norm(pos[i] - pos[j]))
            sj = screen[j] * rho[j]
            if rho[i] >= d + sj:
                continue  # j's descreening sphere fully inside i
            lo = max(abs(d - sj), rho[i])
            up = d + sj
            term = (
                1.0 / lo
                - 1.0 / up
                + 0.25 * (d - sj * sj / d) * (1.0 / up**2 - 1.0 / lo**2)
                + 0.5 * math.log(lo / up) / d
            )
            if rho[i] < sj - d:
                term += 2.0 * (1.0 / rho[i] - 1.0 / lo)
            acc += term
        psi = 0.5 * rho[i] * acc
        tanh_arg = psi * (1.0 + psi * (-0.8 + 4.85 * psi))
        born[i] = 1.0 / (1.0 / rho[i] - math.tanh(tanh_arg) / radii[i])
    return born


def oracle_gb_energy(
    pos, ff, solvent_dielectric=80.0, ion_concentration=0.0, temperature=300.0
):
    """Still-equation GB polarization energy, pair loops incl. self terms."""
    pos = np.asarray(pos, np.float64)
    q = np.asarray(ff.charges, np.float64)
    born = oracle_born_radii(pos, ff)
    n = len(q)
    kappa = 0.0
    if ion_concentration > 0.0:
        kappa = KAPPA_FACTOR * math.sqrt(
            ion_concentration / (solvent_dielectric * temperature)
        )
    e = 0.0
    for i in range(n):
        for j in range(n):
            d2 = float(np.sum((pos[i] - pos[j]) ** 2))
            bb = born[i] * born[j]
            f = math.sqrt(d2 + bb * math.exp(-d2 / (4.0 * bb)))
            if kappa > 0.0:
                scr = math.exp(-kappa * f) / solvent_dielectric
            else:
                scr = 1.0 / solvent_dielectric
            e += -0.5 * ELEC_FACTOR * (1.0 - scr) * q[i] * q[j] / f
    return e


def oracle_sasa(pos, ff):
    """LCPO surface areas, explicit neighbor loops (Weiser eq. 1-3)."""
    pos = np.asarray(pos, np.float64)
    radii = np.asarray(ff.sasa_radii, np.float64)
    p = np.asarray(ff.sasa_params, np.float64)
    n = len(radii)

    def a_pair(i, j):
        d = float(np.linalg.norm(pos[i] - pos[j]))
        ri, rj = radii[i], radii[j]
        if radii[i] <= 0 or radii[j] <= 0:
            return 0.0
        if d >= ri + rj or d <= abs(ri - rj):
            return 0.0
        return 2.0 * math.pi * ri * (ri - d / 2.0 - (ri * ri - rj * rj) / (2.0 * d))

    areas = np.zeros(n)
    for i in range(n):
        if radii[i] <= 0:
            continue
        nbrs = [j for j in range(n) if j != i and a_pair(i, j) != 0.0]
        s1 = 4.0 * math.pi * radii[i] ** 2
        t2 = sum(a_pair(i, j) for j in nbrs)
        t3 = 0.0
        t4 = 0.0
        for j in nbrs:
            inner = 0.0
            for k in nbrs:
                if k == j:
                    continue
                ajk = a_pair(j, k)
                if ajk != 0.0:
                    t3 += ajk
                    inner += ajk
            t4 += a_pair(i, j) * inner
        areas[i] = max(
            p[i, 0] * s1 + p[i, 1] * t2 + p[i, 2] * t3 + p[i, 3] * t4, 0.0
        )
    return areas
