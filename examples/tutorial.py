#!/usr/bin/env python
"""End-to-end walkthrough — the framework's version of the reference's
bring-up tutorial (V_Calculations/Test-1/tutorial.ipynb):

  topology -> force field -> per-term energies -> minimize ->
  Maxwell-Boltzmann init -> Langevin dynamics with an SMD bias ->
  CSV energy log + trajectory artifacts -> VMD loader.

Run:  python examples/tutorial.py  (CPU ok; a few minutes cold)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import molecular_dynamics_tpu as mdx
from molecular_dynamics_tpu.examples import (
    BACKBONE_COLVAR,
    BACKBONE_FF_PRM,
    decaalanine_backbone,
)
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
from molecular_dynamics_tpu.ff import YamlForceField
from molecular_dynamics_tpu.integrate import initialize_forces
from molecular_dynamics_tpu.io import write_dcd, write_xyz
from molecular_dynamics_tpu.log import write_simulation_log
from molecular_dynamics_tpu.sim import SimulationConfig, simulate
from molecular_dynamics_tpu.utils import write_vmd_loader


def main(out_dir="tutorial_out", n_steps=5000):
    os.makedirs(out_dir, exist_ok=True)

    # 1. Build the system (Molecule + ForceField + Parameters in one line)
    top, coords = decaalanine_backbone()
    ff = mdx.build_ff_params(top, YamlForceField(BACKBONE_FF_PRM))
    print("system:", top.describe())

    # 2. Score a frame (Energy.calc_energy equivalent)
    terms = jax.jit(
        lambda p: mdx.energy_terms(p, ff, config=REFERENCE_CONFIG)
    )(jnp.asarray(coords))
    print("energies:", {k: round(float(v), 2) for k, v in terms.items()})

    # 3. Minimize (minimize_bfgs equivalent)
    force = lambda p: mdx.force_fn(REFERENCE_CONFIG)(p, ff)
    pos = jax.jit(
        lambda p: mdx.minimize_fire(
            p, force, n_steps=1500, dt_start=1e-3, dt_max=1e-2
        )
    )(jnp.asarray(coords))
    print("E after minimize:", round(float(mdx.total_energy(pos, ff)), 2))

    # 4. SMD bias starting at the current end-to-end distance
    d0 = float(jnp.linalg.norm(pos[39] - pos[0]))
    bias = mdx.HarmonicSMDBias.create(
        n_atoms=top.n_atoms,
        group1=BACKBONE_COLVAR["group1"],
        group2=BACKBONE_COLVAR["group2"],
        fk=BACKBONE_COLVAR["fk"],
        cent_0=d0,
        cent_1=d0 + 6.0,
        T=float(n_steps),
    )

    # 5. Thermalize + run Langevin dynamics (Integrator.step loop)
    key = jax.random.PRNGKey(0)
    state = mdx.system_init(
        pos, vel=mdx.maxwell_boltzmann(key, ff.masses, 300.0), key=key
    )
    state = initialize_forces(
        state,
        lambda p, b: -jax.grad(
            lambda q: mdx.total_energy(q, ff, config=REFERENCE_CONFIG)
            + bias.energy(q, 0)
        )(p),
    )
    cfg = SimulationConfig(dt_fs=1.0, temperature=300.0, gamma_ps=1.0)
    final, frames, log = simulate(
        state, ff, n_steps=n_steps, save_every=50, config=cfg, bias=bias
    )
    print(
        f"T = {float(log['T'][-1]):.0f} K, colvar "
        f"{float(log['colvar_value'][0]):.1f} -> "
        f"{float(log['colvar_value'][-1]):.1f} A "
        f"(center {float(log['colvar_center'][-1]):.1f})"
    )

    # 6. Artifacts: LogWriter CSV + npy/xyz/dcd + VMD loader
    write_simulation_log(os.path.join(out_dir, "sim_log.csv"), log)
    traj = np.asarray(frames)
    np.save(os.path.join(out_dir, "raw-traj_rep-0.npy"), traj)
    write_xyz(
        os.path.join(out_dir, "traj.xyz"),
        traj,
        symbols=[str(n) for n in top.atom_names],
    )
    write_dcd(os.path.join(out_dir, "traj.dcd"), traj)
    write_vmd_loader(
        os.path.join(out_dir, "loadall.tcl"), ["traj.xyz"]
    )
    print("artifacts in", out_dir)


if __name__ == "__main__":
    main()
