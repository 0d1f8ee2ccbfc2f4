"""molecular_dynamics_tpu (``mdx``) — TPU-native differentiable molecular dynamics.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
johncava/Molecular_Dynamics research codebase (see SURVEY.md):

- ``mdx.io``        — PSF / PDB / PRMTOP (incl. chamber) / YAML-FF / XYZ / DCD / NPY
- ``mdx.ff``        — dense force-field parameter pytrees (``FFParams``)
- ``mdx.energy``    — pure-functional differentiable energy terms (bonds, angles,
                      AMBER+CHARMM torsions, impropers, LJ+switching, Coulomb+RFA,
                      repulsion, 1-4 scaled, Urey-Bradley)
- ``mdx.solvent``   — GB-OBC II implicit solvent + LCPO SASA (the NAMD GBIS
                      protocol the reference's training data was made with)
- ``mdx.system``    — functional MD state pytree (pos/vel/box/forces/rng)
- ``mdx.integrate`` — fused velocity-Verlet / Langevin steps, minimizers,
                      Maxwell-Boltzmann initialisation
- ``mdx.bias``      — steered-MD (moving harmonic colvar) bias forces
- ``mdx.sim``       — vmapped/sharded replica campaigns with lax.scan rollouts
- ``mdx.features``  — dihedral/φψ extraction, distance matrices, Kabsch/RMSD
- ``mdx.models``    — physics-informed generative model zoo (cGAN, cFlow, cVAE,
                      HNN, neural SDE-GAN, LSTM/Seq2Seq, GAT-GNS, Transformer)
- ``mdx.train``     — training loops, optimizers, checkpointing
- ``mdx.parallel``  — device-mesh sharding of replicas / data-parallel training

Everything in the compute path is jit-compatible, vmap-able over replicas and
differentiable end-to-end (training can backprop through the integrator).
"""

from molecular_dynamics_tpu import units
from molecular_dynamics_tpu.topology import Topology
from molecular_dynamics_tpu.ff import FFParams, build_ff_params
from molecular_dynamics_tpu.energy import (
    EnergyConfig,
    GBIS_CONFIG,
    REFERENCE_CONFIG,
    energy_terms,
    total_energy,
    force_fn,
    energy_and_forces,
)
from molecular_dynamics_tpu import solvent
from molecular_dynamics_tpu.system import MDState, system_init
from molecular_dynamics_tpu.integrate import (
    velocity_verlet_step,
    langevin_step,
    maxwell_boltzmann,
    kinetic_energy,
    temperature,
    minimize_fire,
    minimize_lbfgs,
)
from molecular_dynamics_tpu.bias import HarmonicSMDBias

__version__ = "0.1.0"

__all__ = [
    "units",
    "Topology",
    "FFParams",
    "build_ff_params",
    "EnergyConfig",
    "GBIS_CONFIG",
    "REFERENCE_CONFIG",
    "solvent",
    "energy_terms",
    "total_energy",
    "force_fn",
    "energy_and_forces",
    "MDState",
    "system_init",
    "velocity_verlet_step",
    "langevin_step",
    "maxwell_boltzmann",
    "kinetic_energy",
    "temperature",
    "minimize_fire",
    "minimize_lbfgs",
    "HarmonicSMDBias",
]
