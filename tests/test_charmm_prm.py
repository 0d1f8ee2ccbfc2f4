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
