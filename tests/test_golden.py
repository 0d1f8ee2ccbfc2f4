"""Golden parity vs the reference's *recorded* TorchMD output.

The reference retains real TorchMD per-term energies and the forces tensor
for the flagship backbone system in
``V_Calculations/Test-1/tutorial.ipynb`` (cell 10 output): the system
``backbone-no-improp.psf`` + ``backbone.pdb`` scored with
``param_bb-3.0.yaml`` at ``Forces(parameters, cutoff=9, rfa=True,
switch_dist=7.5)``. These tests pin this repo's full io→ff→energy stack to
those recorded numbers — NOT to a repo-written oracle — so parameter-assembly
bugs (e.g. charge sourcing) cannot hide.

The fixture files in ``tests/goldens/`` are byte-identical copies of the
reference's ``V_Calculations/Test-1/data/`` inputs (pure data: topology,
coordinates, force-field constants).
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDENS = pathlib.Path(__file__).parent / "goldens"

#: recorded TorchMD per-term energies, kcal/mol (tutorial.ipynb cell 10,
#: float32 run). North-star tolerance: 1e-4 kcal/mol (BASELINE.md).
GOLD_ENERGIES = {
    "electrostatics": 627.0636596679688,
    "lj": 11.866900444030762,
    "bonds": 20.15338134765625,
    "angles": 21.72222900390625,
    "dihedrals": 7.024267196655273,
    "1-4": 0.0,
    "impropers": 0.0,
}

#: recorded TorchMD forces tensor (tutorial.ipynb cell 10), kcal/mol/A,
#: printed to 5 significant digits — all 40 atoms.
GOLD_FORCES = np.array([
    [9.4370e+00, -4.1128e+01, -1.6852e+01],
    [-4.1977e+00, 3.3838e+01, 1.6829e+01],
    [-1.9985e+01, -7.5960e-01, -2.3018e+01],
    [2.0118e+01, 1.3214e+00, 1.3461e+01],
    [-5.5166e+00, 1.1977e+00, 3.8847e-01],
    [2.1103e+00, 2.6962e+00, 1.7270e+01],
    [-1.0189e+01, 1.5651e+01, -3.7272e+01],
    [4.3254e+00, -1.3596e+01, 6.9031e+00],
    [1.1188e+01, -3.6457e+00, 8.7871e+00],
    [-4.8800e+00, 7.3912e-02, 1.7853e+00],
    [-3.7675e+01, 1.7862e+01, 3.7025e+01],
    [3.4382e+01, -2.1014e+01, -1.6628e+01],
    [1.2856e+01, 1.6769e+01, -2.1377e+01],
    [3.4195e+01, -3.2903e+00, -2.9654e+01],
    [-3.1014e+01, 1.6444e+01, 6.4842e+01],
    [1.4955e+00, -1.4509e+00, -2.1269e+01],
    [-8.0969e+00, -1.4808e+01, -2.4813e+01],
    [-1.4182e+01, 1.3020e+01, -2.0112e+01],
    [-4.6748e+00, -2.2551e+00, 4.8668e+01],
    [4.8619e+00, -6.8609e+00, -2.0831e+01],
    [2.0235e+01, -1.8742e+01, -7.5937e+00],
    [-2.0987e+01, -1.0844e+01, 1.9936e+01],
    [1.8877e+01, 3.5699e+01, -7.8102e+01],
    [-6.2307e+00, -2.0175e+01, 3.7622e+01],
    [1.1104e+01, -1.2227e+01, 1.6043e+01],
    [-2.0297e+01, 1.1825e+01, 1.6888e+01],
    [-1.2259e+01, -7.5458e+00, -1.6070e+01],
    [1.1713e+01, 7.7203e+00, 1.4263e+01],
    [9.8468e+00, 9.0388e+00, 4.4082e+00],
    [-2.3873e+01, -4.1691e+01, 2.5118e+01],
    [5.6156e+01, 3.6707e+01, -5.0358e+01],
    [-2.7853e+01, 6.8871e+00, 2.9530e+01],
    [-1.3554e+01, 3.9490e+00, -2.0194e+01],
    [1.2138e+01, -3.6849e-01, 2.6386e+01],
    [-1.6890e+01, 2.9167e+00, -2.7775e+01],
    [-5.4167e-01, -4.2906e+00, 6.3286e+00],
    [-2.4667e+01, -4.4082e+01, -5.5472e+01],
    [1.5455e+01, 1.6400e+00, 3.0641e+01],
    [1.1725e+01, -1.7540e+01, 4.4629e+01],
    [5.3451e+00, 5.1058e+01, -3.6037e-01],
])


@pytest.fixture(scope="module")
def golden_system():
    from molecular_dynamics_tpu.io import read_psf, read_pdb
    from molecular_dynamics_tpu.ff import YamlForceField, build_ff_params

    top = read_psf(str(GOLDENS / "backbone-no-improp.psf"))
    coords = read_pdb(str(GOLDENS / "backbone.pdb"))[0]
    ff = build_ff_params(
        top, YamlForceField(str(GOLDENS / "param_bb-3.0.yaml")), dtype=jnp.float64
    )
    return top, ff, np.asarray(coords, np.float64)


class TestGoldenEnergies:
    def test_per_term_energies_match_recorded_torchmd(self, golden_system):
        from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, energy_terms

        _, ff, coords = golden_system
        terms = jax.jit(
            lambda p: energy_terms(p, ff, None, REFERENCE_CONFIG)
        )(jnp.asarray(coords))
        for name, gold in GOLD_ENERGIES.items():
            got = float(terms[name])
            assert abs(got - gold) <= 1e-4, (
                f"{name}: got {got!r}, recorded TorchMD {gold!r} "
                f"(diff {got - gold:+.2e} kcal/mol)"
            )

    def test_charges_come_from_psf_not_type_table(self, golden_system):
        # The recorded electrostatics only reproduces with the PSF per-atom
        # charges: terminal atoms carry -0.62/-0.10 in the PSF while their
        # types map to -0.47/+0.07 in the YAML (total charge -4.32 vs -4.00).
        _, ff, _ = golden_system
        q = np.asarray(ff.charges)
        np.testing.assert_allclose(q.sum(), -4.32, atol=1e-6)
        np.testing.assert_allclose(q[0], -0.62, atol=1e-6)

    def test_forces_match_recorded_torchmd(self, golden_system):
        from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, total_energy

        _, ff, coords = golden_system
        f = -jax.grad(
            lambda p: total_energy(p, ff, None, REFERENCE_CONFIG)
        )(jnp.asarray(coords))
        # golden tensor is printed to 5 significant digits; tolerance covers
        # print quantization (~1e-3 abs on O(10) entries) + f32-vs-f64
        np.testing.assert_allclose(
            np.asarray(f), GOLD_FORCES, rtol=5e-4, atol=5e-3
        )
