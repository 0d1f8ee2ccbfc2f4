"""Molecular file I/O: topology readers and trajectory codecs.

TPU-native replacement for the reference's forked moleculekit readers
(V_Calculations/Test-6_full_system/readers.py — SURVEY.md §L2) and its
MDAnalysis-based DCD converters (Data_Processing_Scripts/): everything
produces plain numpy, feeding ``mdx.ff`` / ``mdx.sim``.
"""

from molecular_dynamics_tpu.io.psf import read_psf
from molecular_dynamics_tpu.io.pdb import read_pdb, write_pdb
from molecular_dynamics_tpu.io.xyz import write_xyz, read_xyz
from molecular_dynamics_tpu.io.prmtop import read_prmtop, prmtop_to_ff_params
from molecular_dynamics_tpu.io.dcd import read_dcd, write_dcd
from molecular_dynamics_tpu.io.charmm_prm import CharmmPrm
from molecular_dynamics_tpu.io.xsc import read_xsc
from molecular_dynamics_tpu.io.xtc import read_xtc, write_xtc
from molecular_dynamics_tpu.io.mol2 import read_mol2, write_mol2
from molecular_dynamics_tpu.io.sdf import read_sdf

__all__ = [
    "read_psf",
    "read_pdb",
    "write_pdb",
    "write_xyz",
    "read_xyz",
    "read_prmtop",
    "prmtop_to_ff_params",
    "read_dcd",
    "write_dcd",
    "CharmmPrm",
    "read_xsc",
    "read_xtc",
    "write_xtc",
    "read_mol2",
    "write_mol2",
    "read_sdf",
]
