"""Topology readers + trajectory codec round-trips.

Mirrors the reference's inherited reader test style (readers.py:2261-2588
golden round-trips, SURVEY.md §4.2): PSF/PRMTOP fixtures are read from the
mounted reference repo when available; codec round-trips are self-contained.
"""

import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference

from molecular_dynamics_tpu.io import (
    read_psf,
    read_pdb,
    write_pdb,
    write_xyz,
    read_xyz,
    read_prmtop,
    write_dcd,
    read_dcd,
)

BACKBONE_PSF = (
    REFERENCE_DIR / "V_Calculations/Test-5_bias_n_improper/data/backbone.psf"
)
BACKBONE_PDB = (
    REFERENCE_DIR / "V_Calculations/Test-5_bias_n_improper/data/backbone.pdb"
)
DIALA_PRMTOP = (
    REFERENCE_DIR / "V_Calculations/Test-10_diALA/data/diALA-1.0.prmtop"
)
FULL_DA_PRMTOP = (
    REFERENCE_DIR / "V_Calculations/Test-6_full_system/data/full_da-1.3.prmtop"
)


@requires_reference
class TestPSF:
    def test_backbone_counts(self):
        top = read_psf(str(BACKBONE_PSF))
        assert top.n_atoms == 40
        assert len(top.bonds) == 39
        assert len(top.angles) == 47
        assert len(top.dihedrals) == 46
        assert len(top.impropers) == 9
        assert list(top.atom_types[:4]) == ["N", "CA", "C", "O"]

    def test_matches_generated_example(self):
        """The built-in example reproduces the reference PSF connectivity."""
        from molecular_dynamics_tpu.examples import decaalanine_backbone

        ref = read_psf(str(BACKBONE_PSF))
        gen, _ = decaalanine_backbone()

        def pairset(arr, canon):
            return {tuple(canon(r)) for r in arr.tolist()}

        assert pairset(ref.bonds, sorted) == pairset(gen.bonds, sorted)
        canon3 = lambda a: a if a[0] < a[2] else a[::-1]
        canon4 = lambda a: a if a[0] < a[3] else a[::-1]
        assert pairset(ref.angles, canon3) == pairset(gen.angles, canon3)
        assert pairset(ref.dihedrals, canon4) == pairset(gen.dihedrals, canon4)
        assert pairset(ref.impropers, list) == pairset(gen.impropers, list)
        assert list(ref.atom_types) == list(gen.atom_types)


@requires_reference
class TestPRMTOP:
    def test_diala_plain_amber(self):
        top, raw = read_prmtop(str(DIALA_PRMTOP))
        assert top.n_atoms == 22
        assert abs(top.charges.sum()) < 1e-4  # neutral
        assert len(top.bonds) > 0 and len(top.dihedrals) > 0

    def test_full_da_chamber(self):
        top, raw = read_prmtop(str(FULL_DA_PRMTOP))
        assert top.n_atoms == 104
        assert "CHARMM_IMPROPERS" in raw  # chamber file detected
        # chamber charge total: deca-alanine zwitterion is neutral overall
        assert abs(top.charges.sum()) < 1e-3
        assert top.masses[0] == pytest.approx(14.007, abs=0.01)

    def test_full_da_ff_params(self):
        import jax.numpy as jnp
        from molecular_dynamics_tpu.io import prmtop_to_ff_params

        ff = prmtop_to_ff_params(str(FULL_DA_PRMTOP), dtype=jnp.float64)
        assert ff.n_atoms == 104
        assert ff.bonds.shape[0] > 0
        assert ff.ub_bonds.shape[0] > 0  # chamber UB terms present
        assert bool(jnp.all(ff.nb14_params[:, 2] > 0))  # scnb positive


@requires_reference
def test_pdb_reference_fixture():
    coords, names, resnames, resids = read_pdb(str(BACKBONE_PDB))
    assert coords.shape == (40, 3)
    assert names[0] == "N"


class TestCodecs:
    def test_xyz_roundtrip(self, tmp_path, rng):
        frames = rng.normal(0, 5, (3, 17, 3))
        p = tmp_path / "t.xyz"
        write_xyz(str(p), frames)
        back = read_xyz(str(p))
        np.testing.assert_allclose(back, frames, atol=1e-5)

    def test_pdb_roundtrip(self, tmp_path, rng):
        coords = rng.normal(0, 5, (9, 3)).round(3)
        names = np.array([f"C{i}" for i in range(9)])
        p = tmp_path / "t.pdb"
        write_pdb(str(p), coords, names)
        back, bnames, _, _ = read_pdb(str(p))
        np.testing.assert_allclose(back, coords, atol=1e-3)
        assert list(bnames) == list(names)

    def test_dcd_roundtrip(self, tmp_path, rng):
        frames = rng.normal(0, 8, (5, 33, 3)).astype(np.float32)
        p = tmp_path / "t.dcd"
        write_dcd(str(p), frames)
        back, cells = read_dcd(str(p))
        assert cells is None
        np.testing.assert_allclose(back, frames, atol=1e-6)

    def test_dcd_roundtrip_with_cell(self, tmp_path, rng):
        frames = rng.normal(0, 8, (2, 11, 3)).astype(np.float32)
        cell = np.array(
            [[30.0, 90, 30, 90, 90, 30], [31.0, 90, 31, 90, 90, 31]]
        )
        p = tmp_path / "t.dcd"
        write_dcd(str(p), frames, cell=cell)
        back, cells = read_dcd(str(p))
        np.testing.assert_allclose(back, frames, atol=1e-6)
        np.testing.assert_allclose(cells, cell)

    @requires_reference
    def test_dcd_reads_namd_output(self):
        smd = (
            REFERENCE_DIR
            / "All_ML_Training_Data/210905_SMD_decaalanine/SMD/output/0/smd_out.dcd"
        )
        if not smd.exists():
            pytest.skip("NAMD dcd not present")
        coords, cells = read_dcd(str(smd))
        assert coords.ndim == 3 and coords.shape[2] == 3
        assert np.isfinite(coords).all()


class TestMol2Sdf:
    def test_mol2_roundtrip(self, tmp_path, rng):
        from molecular_dynamics_tpu.io import read_mol2, write_mol2

        coords = rng.normal(0, 5, (6, 3)).round(4)
        names = np.array(["C1", "C2", "N1", "O1", "H1", "H2"], object)
        types = np.array(["C.3", "C.ar", "N.am", "O.2", "H", "H"], object)
        charges = np.array([0.1, -0.2, 0.3, -0.4, 0.05, 0.15])
        bonds = np.array([[0, 1], [1, 2], [2, 3], [0, 4], [0, 5]])
        btypes = np.array(["1", "ar", "am", "1", "1"], object)
        p = tmp_path / "t.mol2"
        write_mol2(
            str(p), coords, names, atom_types=types, charges=charges,
            bonds=bonds, bond_types=btypes,
        )
        m = read_mol2(str(p))
        np.testing.assert_allclose(m["coords"], coords, atol=1e-4)
        assert list(m["names"]) == list(names)
        assert list(m["atom_types"]) == list(types)
        assert list(m["elements"]) == ["C", "C", "N", "O", "H", "H"]
        np.testing.assert_allclose(m["charges"], charges, atol=1e-4)
        np.testing.assert_array_equal(m["bonds"], bonds)
        assert list(m["bond_types"]) == list(btypes)

    def test_mol2_first_molecule_only(self, tmp_path):
        from molecular_dynamics_tpu.io import read_mol2

        text = (
            "# comment\n"
            "@<TRIPOS>MOLECULE\nm1\n2 1 0 0 0\nSMALL\nNO_CHARGES\n"
            "@<TRIPOS>ATOM\n"
            "1 CA 0.0 0.0 0.0 C.3 1 ALA 0.0\n"
            "2 CB 1.5 0.0 0.0 C.3 1 ALA 0.0\n"
            "@<TRIPOS>BOND\n1 1 2 1\n"
            "@<TRIPOS>MOLECULE\nm2\n1 0 0 0 0\nSMALL\nNO_CHARGES\n"
            "@<TRIPOS>ATOM\n1 X 9.0 9.0 9.0 C.3 1 UNK 0.0\n"
        )
        p = tmp_path / "two.mol2"
        p.write_text(text)
        m = read_mol2(str(p))
        assert len(m["coords"]) == 2  # second molecule not merged in
        assert m["bonds"].shape == (1, 2)

    def test_sdf_v2000(self, tmp_path):
        from molecular_dynamics_tpu.io import read_sdf

        # two records: atom-block charge codes, then an M  CHG override
        rec1 = (
            "benzene-ish\n  mdx\n\n"
            "  3  2  0  0  0  0  0  0  0  0999 V2000\n"
            "    0.0000    0.0000    0.0000 C   0  0  0  0  0  0\n"
            "    1.4000    0.0000    0.0000 N   0  3  0  0  0  0\n"
            "   -1.4000    0.0000    0.0000 O   0  5  0  0  0  0\n"
            "  1  2  1  0\n"
            "  1  3  2  0\n"
            "M  END\n$$$$\n"
        )
        rec2 = (
            "chg-override\n  mdx\n\n"
            "  2  1  0  0  0  0  0  0  0  0999 V2000\n"
            "    0.0000    0.0000    0.0000 S   0  1  0  0  0  0\n"
            "    2.0000    0.0000    0.0000 K   0  0  0  0  0  0\n"
            "  1  2  1  0\n"
            "M  CHG  2   1  -1   2   1\n"
            "M  END\n$$$$\n"
        )
        p = tmp_path / "t.sdf"
        p.write_text(rec1 + rec2)
        recs = read_sdf(str(p))
        assert len(recs) == 2
        r1, r2 = recs
        assert r1["name"] == "benzene-ish"
        assert list(r1["elements"]) == ["C", "N", "O"]
        # atom-block codes: 3 -> +1, 5 -> -1
        assert list(r1["charges"]) == [0, 1, -1]
        np.testing.assert_array_equal(r1["bonds"], [[0, 1], [0, 2]])
        assert list(r1["bond_types"]) == ["1", "2"]
        np.testing.assert_allclose(r1["coords"][:, 0], [0.0, 1.4, -1.4])
        # M  CHG wipes the atom block's +3 on atom 1 and sets -1/+1
        assert list(r2["charges"]) == [-1, 1]
