"""CHARMM .prm parameter files: parsing + full PSF+PRM system assembly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import REFERENCE_DIR, requires_reference

from molecular_dynamics_tpu.io import read_psf, read_pdb
from molecular_dynamics_tpu.io.charmm_prm import CharmmPrm
from molecular_dynamics_tpu.ff import build_ff_params
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, total_energy
import dataclasses

PAR22 = REFERENCE_DIR / "V_Calculations/Test-10_diALA/data/par_all22_prot.prm"
PROT_PSF = REFERENCE_DIR / "V_Calculations/Test-10_diALA/data/protein.psf"
ALAD_PDB = REFERENCE_DIR / "V_Calculations/Test-10_diALA/data/alad.pdb"
CAMPAIGN = REFERENCE_DIR / "All_ML_Training_Data/210905_SMD_decaalanine"
PAR27 = CAMPAIGN / "charmm/par_all27_prot_lipid_cmap.prm"
DA_PSF = CAMPAIGN / "Build/da.psf"
DA_PDB = CAMPAIGN / "Build/smd_ini.pdb"


@requires_reference
class TestCharmmPrm:
    @pytest.fixture(scope="class")
    def prm(self):
        return CharmmPrm(str(PAR22))

    def test_sections_parsed(self, prm):
        assert len(prm.bonds) > 100
        assert len(prm.angles) > 300
        assert len(prm.dihedrals) > 150
        assert len(prm.impropers) > 20
        assert len(prm.nonbonded) > 40

    def test_known_entries(self, prm):
        # canonical CHARMM22 protein values
        k, b0 = prm.get_bond("NH1", "C")
        assert k == pytest.approx(370.0)
        assert b0 == pytest.approx(1.345)
        k, t0 = prm.get_angle("NH1", "C", "O")
        assert k == pytest.approx(80.0)
        assert t0 == pytest.approx(np.radians(122.5))
        sig, eps = prm.get_LJ("C")
        assert eps == pytest.approx(0.11)  # |eps| of carbonyl C
        # wildcard dihedral lookup resolves
        terms = prm.get_dihedral("CT3", "CT2", "CT2", "CT3")
        assert len(terms) >= 1

    def test_lj_ab_matches_charmm_form(self, prm):
        """A = eps*Rmin^12, B = 2*eps*Rmin^6 through the LB builder."""
        from molecular_dynamics_tpu.ff.builder import _lb_ab

        sig, eps = prm.get_LJ("C")
        a, b = _lb_ab(sig, sig, eps, eps)
        rmin = 2.0 * prm.nonbonded["C"][1]
        assert a == pytest.approx(eps * rmin**12, rel=1e-10)
        assert b == pytest.approx(2 * eps * rmin**6, rel=1e-10)

    def test_full_psf_prm_system(self, prm):
        """Assemble di-alanine from PSF topology + PRM parameters and
        evaluate finite, FD-consistent forces (the NAMD pairing)."""
        top = read_psf(str(PROT_PSF))
        coords, *_ = read_pdb(str(ALAD_PDB))
        assert top.n_atoms == coords.shape[0]
        ff = build_ff_params(
            top, prm, charges_from="topology", urey_bradley=True,
            dtype=jnp.float64,
        )
        assert ff.ub_bonds.shape[0] > 0  # CHARMM UB terms found
        cfg = dataclasses.replace(REFERENCE_CONFIG, urey_bradley=True)
        f = jax.jit(lambda p: total_energy(p, ff, config=cfg))
        pos = jnp.asarray(coords, jnp.float64)
        e0 = float(f(pos))
        assert np.isfinite(e0)
        g = jax.jit(jax.grad(lambda p: total_energy(p, ff, config=cfg)))(pos)
        eps_fd = 1e-6
        p = np.asarray(coords, float)
        pp, pm = p.copy(), p.copy()
        pp[3, 0] += eps_fd
        pm[3, 0] -= eps_fd
        fd = (float(f(jnp.asarray(pp))) - float(f(jnp.asarray(pm)))) / (2 * eps_fd)
        assert float(g[3, 0]) == pytest.approx(fd, rel=1e-5, abs=1e-5)


@requires_reference
class TestCmap:
    """CHARMM CMAP phi/psi cross-term correction (par_all27 grids)."""

    @pytest.fixture(scope="class")
    def system(self):
        from molecular_dynamics_tpu.io import read_pdb, read_psf

        prm = CharmmPrm(str(PAR27))
        top = read_psf(str(DA_PSF))
        coords, *_ = read_pdb(str(DA_PDB))
        ff = build_ff_params(
            top, prm, charges_from="topology", dtype=jnp.float64
        )
        return prm, ff, coords

    def test_grids_parsed(self, system):
        prm, _, _ = system
        assert len(prm.cmaps) == 6  # ala/pro/gly x {NH1, N-next}
        g = prm.cmaps[("C", "NH1", "CT1", "C", "NH1", "CT1", "C", "NH1")]
        assert g.shape == (24, 24)
        # first values of the alanine map at phi=-180: psi=-180 and -120
        assert g[0, 0] == pytest.approx(0.126790)
        assert g[0, 4] == pytest.approx(2.121010)

    def test_cross_terms_derived(self, system):
        # da.psf predates NCRTERM -> backbone-derived: 8 interior residues
        _, ff, _ = system
        assert ff.has_cmap
        assert ff.cmap_idx.shape == (8, 8)
        # each row: phi (C-,N,CA,C) then psi (N,CA,C,N+); shared atoms match
        idx = np.asarray(ff.cmap_idx)
        np.testing.assert_array_equal(idx[:, 1:4], idx[:, 4:7])

    def test_cmap_energy_and_fd_forces(self, system):
        _, ff, coords = system
        cfg = dataclasses.replace(REFERENCE_CONFIG, terms=("cmap",))
        f = jax.jit(lambda p: total_energy(p, ff, config=cfg))
        pos = jnp.asarray(coords, jnp.float64)
        e = float(f(pos))
        # alanine-map corrections are a few kcal/mol over 8 cross-terms
        assert np.isfinite(e) and abs(e) < 50.0
        g = jax.jit(jax.grad(lambda p: total_energy(p, ff, config=cfg)))(pos)
        eps = 1e-6
        for a in np.unique(np.asarray(ff.cmap_idx))[:4]:
            for d in range(3):
                pp = np.array(coords, float)
                pm = pp.copy()
                pp[a, d] += eps
                pm[a, d] -= eps
                fd = (float(f(jnp.asarray(pp))) - float(f(jnp.asarray(pm)))) / (2 * eps)
                assert float(g[a, d]) == pytest.approx(fd, rel=1e-4, abs=1e-6)

    def test_bicubic_node_exact_and_continuous(self):
        from molecular_dynamics_tpu.ff.params import bicubic_coefficients

        rng = np.random.default_rng(0)
        grid = rng.normal(0, 2, (24, 24))
        a = bicubic_coefficients(grid)
        # interpolant hits the grid values at the nodes
        np.testing.assert_allclose(a[:, :, 0, 0], grid, atol=1e-12)
        # continuity across cell edges (periodic)
        t1 = np.array([1.0, 1.0, 1.0, 1.0])
        u = 0.37
        uv = np.array([1.0, u, u * u, u**3])
        right = np.einsum("ijmn,m,n->ij", a, t1, uv)
        left = np.einsum(
            "ijmn,m,n->ij", np.roll(a, -1, 0),
            np.array([1.0, 0, 0, 0]), uv,
        )
        np.testing.assert_allclose(right, left, atol=1e-10)

    def test_cmap_requires_tables(self):
        """Requesting cmap on a CMAP-less system fails loudly."""
        from molecular_dynamics_tpu.energy import energy_terms
        from molecular_dynamics_tpu.examples import decaalanine_backbone
        from molecular_dynamics_tpu.ff import YamlForceField, build_ff_params
        from molecular_dynamics_tpu.examples import BACKBONE_FF_PRM

        top, coords = decaalanine_backbone()
        ff = build_ff_params(top, YamlForceField(BACKBONE_FF_PRM))
        cfg = dataclasses.replace(REFERENCE_CONFIG, terms=("cmap",))
        with pytest.raises(ValueError, match="CMAP"):
            energy_terms(jnp.asarray(coords, jnp.float32), ff, config=cfg)


class TestBackboneCrossTermsSegments:
    """CMAP pairing must respect segment boundaries (PSF res_ids restart
    per segment; phi/psi must never link across a chain break)."""

    @staticmethod
    def _chain_top(seg_ids, res_ids):
        from molecular_dynamics_tpu.topology import Topology

        names = []
        for _ in range(len(res_ids) // 3):
            names += ["N", "CA", "C"]
        n = len(names)
        return Topology(
            atom_types=np.array(names, object),
            atom_names=np.array(names, object),
            res_names=np.array(["ALA"] * n, object),
            res_ids=np.asarray(res_ids, np.int64),
            charges=np.zeros(n),
            masses=np.ones(n),
            seg_ids=np.array(seg_ids, object),
        )

    def test_two_chains_do_not_collapse(self):
        from molecular_dynamics_tpu.ff.builder import _backbone_cross_terms

        # two segments, each residues 1..3 (res_ids restart per segment)
        seg = ["A"] * 9 + ["B"] * 9
        res = [1, 1, 1, 2, 2, 2, 3, 3, 3] * 2
        rows = _backbone_cross_terms(self._chain_top(seg, res))
        # one interior residue per chain -> 2 cross-terms, none spanning
        # the A|B boundary (atoms 0-8 vs 9-17)
        assert rows.shape == (2, 8)
        for row in rows:
            assert (row < 9).all() or (row >= 9).all()
        # chain A's interior residue pairs C(res1), res2 backbone, N(res3)
        np.testing.assert_array_equal(rows[0], [2, 3, 4, 5, 3, 4, 5, 6])
        np.testing.assert_array_equal(rows[1], rows[0] + 9)

    def test_gap_in_res_ids_breaks_pairing(self):
        from molecular_dynamics_tpu.ff.builder import _backbone_cross_terms

        # missing residue 3: residues 2 and 4 are NOT consecutive
        res = [1, 1, 1, 2, 2, 2, 4, 4, 4, 5, 5, 5]
        rows = _backbone_cross_terms(self._chain_top(["A"] * 12, res))
        assert rows.shape == (0, 8)
