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
