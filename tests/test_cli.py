"""CLI integration: simulate / energy / convert drive the real stack."""

import json
import os

import numpy as np
import pytest

from molecular_dynamics_tpu import cli


def test_simulate_smoke(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "simulate",
        "-o", "n_replicas=2",
        "-o", "n_steps=100",
        "-o", "save_every=50",
        "-o", "minimize_steps=200",
        "-o", "sim.dt_fs=1.0",
        "-o", f"out_dir={tmp_path}/out",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["replicas"] == 2
    traj = np.load(tmp_path / "out" / "raw-traj_rep-0.npy")
    assert traj.shape == (2, 40, 3)
    assert (tmp_path / "out" / "sim_log.csv").exists()
    assert (tmp_path / "out" / "rep0.dcd").exists()


def test_energy_smoke(capsys):
    rc = cli.main(["energy", "--topology", "example:backbone"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert "bonds" in line and "electrostatics" in line


def test_energy_full_system(capsys):
    rc = cli.main(["energy", "--topology", "example:full"])
    assert rc == 0
    assert "impropers" in capsys.readouterr().out


def test_convert_roundtrip(tmp_path, rng, capsys):
    from molecular_dynamics_tpu.io import write_dcd

    frames = rng.normal(0, 5, (4, 12, 3)).astype(np.float32)
    src = str(tmp_path / "in.dcd")
    dst = str(tmp_path / "out.npy")
    write_dcd(src, frames)
    rc = cli.main(["convert", src, dst])
    assert rc == 0
    back = np.load(dst)
    np.testing.assert_allclose(back, frames, atol=1e-5)


def test_convert_to_pdb(tmp_path, rng, capsys):
    """xyz -> multi-model PDB emission (Alpha/predsToPDB.py equivalent):
    backbone heuristic fills N/CA/C/O + ALA records, frames round-trip."""
    from molecular_dynamics_tpu.io import write_xyz
    from molecular_dynamics_tpu.io.pdb import read_pdb

    frames = rng.normal(0, 5, (3, 8, 3)).round(3)
    src = str(tmp_path / "gen.xyz")
    dst = str(tmp_path / "gen.pdb")
    write_xyz(src, frames)
    rc = cli.main(["convert", src, dst])
    assert rc == 0
    coords, names, resnames, resids = read_pdb(dst)
    assert coords.shape == (3, 8, 3)
    np.testing.assert_allclose(coords, frames, atol=1e-3)
    assert list(names) == ["N", "CA", "C", "O"] * 2
    assert set(resnames) == {"ALA"}
    assert list(resids) == [1, 1, 1, 1, 2, 2, 2, 2]


def test_driver_export_writes_pdb_sibling(tmp_path):
    """Every family export emits a PDB next to the xyz (VERDICT r3 #6c)."""
    from molecular_dynamics_tpu.examples import decaalanine_backbone
    from molecular_dynamics_tpu.io.pdb import read_pdb
    from molecular_dynamics_tpu.train.drivers import _export_xyz

    top, coords = decaalanine_backbone()
    batch = np.asarray(coords)[None].repeat(3, 0)
    path = str(tmp_path / "fam_generated.xyz")
    _export_xyz(path, batch, top.atom_names, top=top)
    back, names, resnames, resids = read_pdb(str(tmp_path / "fam_generated.pdb"))
    assert back.shape == batch.shape
    np.testing.assert_allclose(back, batch, atol=1e-3)
    assert list(names) == [str(n) for n in top.atom_names]
    assert list(resids) == list(top.res_ids)
