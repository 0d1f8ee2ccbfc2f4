"""Geometry features, configs, and remaining IO pieces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import REFERENCE_DIR, requires_reference


class TestPhiPsi:
    def test_indices_on_backbone(self):
        from molecular_dynamics_tpu.examples import decaalanine_backbone
        from molecular_dynamics_tpu.features import phi_psi_indices

        top, coords = decaalanine_backbone()
        phi_idx, psi_idx = phi_psi_indices(top)
        # 10 residues: phi needs a previous C (9), psi a next N (9)
        assert phi_idx.shape == (9, 4)
        assert psi_idx.shape == (9, 4)
        # each row is C(i-1) N(i) CA(i) C(i)
        names = [str(n) for n in top.atom_names]
        for row in phi_idx:
            assert [names[i] for i in row] == ["C", "N", "CA", "C"]
        for row in psi_idx:
            assert [names[i] for i in row] == ["N", "CA", "C", "N"]

    def test_values_match_energy_dihedrals(self):
        from molecular_dynamics_tpu.examples import decaalanine_backbone
        from molecular_dynamics_tpu.features import phi_psi, phi_psi_indices
        from molecular_dynamics_tpu.energy import dihedral_angles

        top, coords = decaalanine_backbone()
        phi_idx, psi_idx = phi_psi_indices(top)
        pos = jnp.asarray(coords)
        phis, psis = phi_psi(pos, phi_idx, psi_idx)
        direct = dihedral_angles(pos, jnp.asarray(phi_idx))
        np.testing.assert_allclose(np.asarray(phis), np.asarray(direct))


class TestGeometry:
    def test_distance_matrix_grad_safe(self, rng):
        from molecular_dynamics_tpu.features import distance_matrix

        pos = jnp.asarray(rng.normal(0, 3, (7, 3)))
        g = jax.grad(lambda p: jnp.sum(distance_matrix(p)))(pos)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_kabsch_recovers_rotation(self, rng):
        from molecular_dynamics_tpu.features import kabsch_align, aligned_rmsd

        a = jnp.asarray(rng.normal(0, 3, (12, 3)))
        theta = 1.1
        rot = jnp.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]]
        )
        b = a @ rot.T + jnp.array([1.0, -2.0, 0.5])
        r, t = kabsch_align(a, b)
        np.testing.assert_allclose(np.asarray(r), np.asarray(rot), atol=1e-8)
        # the grad-safe epsilon floors rmsd at sqrt(1e-12) = 1e-6
        assert float(aligned_rmsd(a, b)) <= 1.01e-6

    def test_knn_graph_mask(self, rng):
        from molecular_dynamics_tpu.features import knn_graph_mask

        pos = jnp.asarray(rng.normal(0, 5, (20, 3)))
        adj = knn_graph_mask(pos, 4)
        counts = np.asarray(jnp.sum(adj, axis=1))
        assert (counts >= 4).all()  # >= due to distance ties
        assert not bool(jnp.any(jnp.diag(adj)))


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        from molecular_dynamics_tpu.config import CampaignConfig, load_config

        p = tmp_path / "c.yaml"
        p.write_text(
            "n_replicas: 16\nn_steps: 1000\n"
            "sim: {dt_fs: 1.0, temperature: 310.0}\n"
            "colvar: {fk: 2.0, cent_1: 20.0}\n"
        )
        cfg = load_config(str(p))
        assert cfg.n_replicas == 16
        assert cfg.sim.dt_fs == 1.0
        assert cfg.sim.temperature == 310.0
        assert cfg.colvar.fk == 2.0

    def test_overrides(self):
        from molecular_dynamics_tpu.config import CampaignConfig, apply_overrides

        cfg = CampaignConfig()
        cfg = apply_overrides(
            cfg, ["n_replicas=8", "sim.dt_fs=0.5", "colvar.fk=3.5"]
        )
        assert cfg.n_replicas == 8
        assert cfg.sim.dt_fs == 0.5
        assert cfg.colvar.fk == 3.5

    def test_unknown_key_rejected(self, tmp_path):
        from molecular_dynamics_tpu.config import load_config

        p = tmp_path / "bad.yaml"
        p.write_text("not_a_key: 1\n")
        with pytest.raises(KeyError):
            load_config(str(p))


class TestXSC:
    def test_read_xsc(self, tmp_path):
        from molecular_dynamics_tpu.io import read_xsc

        p = tmp_path / "t.xsc"
        p.write_text(
            "# NAMD extended system configuration\n"
            "#$LABELS step a_x a_y a_z b_x b_y b_z c_x c_y c_z o_x o_y o_z\n"
            "500000 40.0 0 0 0 42.0 0 0 0 44.0 1.0 2.0 3.0\n"
        )
        diag, cell, origin = read_xsc(str(p))
        np.testing.assert_allclose(diag, [40.0, 42.0, 44.0])
        np.testing.assert_allclose(origin, [1.0, 2.0, 3.0])


class TestVMDLoader:
    def test_write_loader(self, tmp_path):
        from molecular_dynamics_tpu.utils import write_vmd_loader

        p = tmp_path / "loadall.tcl"
        write_vmd_loader(str(p), ["a.xyz", "b.xyz"], topology="top.psf")
        text = p.read_text()
        assert "mol new {top.psf}" in text
        assert "mol addfile {a.xyz}" in text
        assert "mol new {b.xyz}" in text
