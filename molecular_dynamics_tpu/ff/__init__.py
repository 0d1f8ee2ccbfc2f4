"""Force-field parameter pytrees.

``FFParams`` is the dense, device-resident equivalent of torchmd's
``Parameters`` object (the interface consumed by TorchMD_Fix/forces.py:39-73
in the reference): masses, charges, bonded index tables with per-term
parameters, 1-4 pairs with scaling factors, and LJ tables.

TPU-first design choices vs the reference:

- LJ A/B and charge products are pre-expanded to per-atom-pair ``(N, N)``
  matrices so the nonbonded term is pure elementwise VPU work (no gathers).
- Dihedral/improper multi-term parameters are padded to a static
  ``(n_torsions, max_terms, 3)`` block with a term mask instead of the
  reference's ragged list-of-dicts (TorchMD_Fix/forces.py:553-563), keeping
  shapes static under jit.
- The nonbonded exclusion set (bonds, angles, 1-4 — Forces.__init__
  exclusions, forces.py:37) is baked into a boolean upper-triangular pair
  mask instead of an index list rebuilt per call (the reference rebuilds it
  every Forces() construction: forces.py:62-68).
"""

from molecular_dynamics_tpu.ff.params import FFParams, finalize_ff_params
from molecular_dynamics_tpu.ff.yaml_ff import YamlForceField
from molecular_dynamics_tpu.ff.builder import build_ff_params

__all__ = ["FFParams", "finalize_ff_params", "YamlForceField", "build_ff_params"]
