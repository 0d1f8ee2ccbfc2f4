"""Energy-core correctness: analytic cases, oracle parity, force consistency.

This is the framework's version of the reference's V_Calculations bring-up
series (SURVEY.md §4): per-term energy parity (vs an independent numpy oracle
implementing the TorchMD formulas) and force = -dE/dx finite-difference
checks.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu.energy import (
    EnergyConfig,
    REFERENCE_CONFIG,
    energy_terms,
    total_energy,
    energy_and_forces,
    dihedral_angles,
)
from molecular_dynamics_tpu.ff.params import finalize_ff_params

from oracle import oracle_energy

F64 = jnp.float64


def ev_terms(pos, ff, cfg):
    """Jitted per-term evaluation (op-by-op dispatch is too slow here)."""
    return jax.jit(lambda p, f: energy_terms(p, f, config=cfg))(pos, ff)


def tiny_params(n_atoms, dtype=F64, **kw):
    """FFParams with only the tables given in kw populated."""
    base = dict(
        masses=np.ones(n_atoms),
        charges=np.zeros(n_atoms),
        bonds=np.zeros((0, 2)),
        bond_params=np.zeros((0, 2)),
        angles=np.zeros((0, 3)),
        angle_params=np.zeros((0, 2)),
        dihedrals=np.zeros((0, 4)),
        dihedral_terms=[],
        impropers=np.zeros((0, 4)),
        improper_terms=[],
        idx14=np.zeros((0, 2)),
        nb14_params=np.zeros((0, 4)),
        lj_a_pair=np.zeros((n_atoms, n_atoms)),
        lj_b_pair=np.zeros((n_atoms, n_atoms)),
    )
    base.update(kw)
    return finalize_ff_params(dtype=dtype, **base)


class TestAnalytic:
    def test_single_bond(self):
        ff = tiny_params(2, bonds=[[0, 1]], bond_params=[[100.0, 1.5]])
        pos = jnp.array([[0.0, 0, 0], [2.0, 0, 0]], F64)
        terms = ev_terms(pos, ff, EnergyConfig())
        assert terms["bonds"] == pytest.approx(100.0 * 0.25, abs=1e-12)

    def test_single_angle(self):
        ff = tiny_params(
            3, angles=[[0, 1, 2]], angle_params=[[50.0, math.pi / 3]]
        )
        pos = jnp.array([[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0]], F64)  # 90 deg
        terms = ev_terms(pos, ff, EnergyConfig())
        expect = 50.0 * (math.pi / 2 - math.pi / 3) ** 2
        assert terms["angles"] == pytest.approx(expect, abs=1e-12)

    def test_amber_dihedral_cis(self):
        # cis configuration => phi = 0 => E = k*(1+cos(-phi0))
        ff = tiny_params(
            4,
            dihedrals=[[0, 1, 2, 3]],
            dihedral_terms=[[(2.5, math.radians(180.0), 2.0)]],
        )
        pos = jnp.array(
            [[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0], [1.0, 1.0, 0]], F64
        )
        phi = dihedral_angles(pos, ff.dihedrals)
        assert float(phi[0]) == pytest.approx(0.0, abs=1e-12)
        terms = ev_terms(pos, ff, EnergyConfig())
        assert terms["dihedrals"] == pytest.approx(
            2.5 * (1 + math.cos(-math.pi)), abs=1e-12
        )

    def test_charmm_improper_harmonic_wrap(self):
        # per=0 CHARMM branch with wrap: phi near +pi vs phi0 = -pi
        ff = tiny_params(
            4,
            impropers=[[0, 1, 2, 3]],
            improper_terms=[[(45.0, -math.pi, 0.0)]],
        )
        pos = jnp.array(
            [[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0], [-1.0, 1.0, 1e-4]], F64
        )
        phi = float(dihedral_angles(pos, ff.impropers)[0])
        assert abs(phi) == pytest.approx(math.pi, abs=1e-3)
        terms = ev_terms(pos, ff, EnergyConfig())
        # wrapped delta is tiny, not ~2pi
        assert float(terms["impropers"]) < 45.0 * (2e-3) ** 2

    def test_lj_pair_with_switching(self):
        eps, sig = 0.5, 3.0
        A, B = 4 * eps * sig**12, 4 * eps * sig**6
        ff = tiny_params(
            2,
            lj_a_pair=np.full((2, 2), A),
            lj_b_pair=np.full((2, 2), B),
        )
        cfg = EnergyConfig(
            terms=("lj",), cutoff=9.0, switch_dist=7.5
        )
        for d in (3.5, 8.0, 9.5):
            pos = jnp.array([[0.0, 0, 0], [d, 0, 0]], F64)
            e = float(ev_terms(pos, ff, cfg)["lj"])
            raw = A / d**12 - B / d**6
            if d > 9.0:
                assert e == 0.0
            elif d > 7.5:
                t = (d - 7.5) / 1.5
                sw = 1 + t**3 * (-10 + t * (15 - t * 6))
                assert e == pytest.approx(raw * sw, rel=1e-12)
            else:
                assert e == pytest.approx(raw, rel=1e-12)

    def test_coulomb_rfa_vanishes_at_cutoff(self):
        ff = tiny_params(2, charges=np.array([1.0, -1.0]))
        cfg = EnergyConfig(terms=("electrostatics",), cutoff=9.0, rfa=True)
        e_at = float(
            ev_terms(jnp.array([[0.0, 0, 0], [8.9999, 0, 0]], F64), ff, cfg)[
                "electrostatics"
            ]
        )
        assert abs(e_at) < 1e-5
        e_mid = float(
            ev_terms(jnp.array([[0.0, 0, 0], [3.0, 0, 0]], F64), ff, cfg)[
                "electrostatics"
            ]
        )
        assert e_mid < -50.0  # attractive, large

    def test_plain_coulomb(self):
        ff = tiny_params(2, charges=np.array([0.5, 0.5]))
        cfg = EnergyConfig(terms=("electrostatics",))
        e = float(
            ev_terms(jnp.array([[0.0, 0, 0], [2.0, 0, 0]], F64), ff, cfg)[
                "electrostatics"
            ]
        )
        assert e == pytest.approx(332.0637132991921 * 0.25 / 2.0, rel=1e-10)


class TestOracleParity:
    """Per-term parity vs the independent numpy oracle on decaalanine —
    the 1e-4 kcal/mol target from BASELINE.md, met at 1e-9 in f64."""

    def _frames(self, coords, rng, n=5, scale=0.1):
        return [
            coords + rng.normal(0, scale, coords.shape) for _ in range(n)
        ]

    def test_reference_config_parity(self, backbone_system, rng):
        top, ff, coords = backbone_system
        fn = jax.jit(
            lambda p: energy_terms(p, ff, config=REFERENCE_CONFIG)
        )
        for frame in self._frames(coords, rng):
            got = {k: float(v) for k, v in fn(jnp.asarray(frame)).items()}
            want = oracle_energy(frame, ff)
            for term, val in want.items():
                assert got[term] == pytest.approx(val, abs=1e-8), term

    def test_no_cutoff_parity(self, backbone_system, rng):
        top, ff, coords = backbone_system
        cfg = EnergyConfig()  # defaults: no cutoff, no rfa, no switching
        fn = jax.jit(lambda p: energy_terms(p, ff, config=cfg))
        for frame in self._frames(coords, rng, n=3):
            got = {k: float(v) for k, v in fn(jnp.asarray(frame)).items()}
            want = oracle_energy(
                frame, ff, cutoff=None, rfa=False, switch_dist=None
            )
            for term, val in want.items():
                assert got[term] == pytest.approx(val, abs=1e-8), term


class TestForces:
    def test_forces_match_finite_differences(self, backbone_system, rng):
        top, ff, coords = backbone_system
        pos = jnp.asarray(coords + rng.normal(0, 0.05, coords.shape))
        _, forces = jax.jit(
            lambda p: energy_and_forces(p, ff, config=REFERENCE_CONFIG)
        )(pos)
        f = jax.jit(lambda p: total_energy(p, ff, config=REFERENCE_CONFIG))
        eps = 1e-6
        for atom, dim in [(0, 0), (7, 1), (19, 2), (39, 0)]:
            pp = np.asarray(pos).copy()
            pm = pp.copy()
            pp[atom, dim] += eps
            pm[atom, dim] -= eps
            fd = -(float(f(jnp.asarray(pp))) - float(f(jnp.asarray(pm)))) / (
                2 * eps
            )
            assert float(forces[atom, dim]) == pytest.approx(fd, rel=1e-5, abs=1e-5)

    def test_vmap_matches_loop(self, backbone_system, rng):
        top, ff, coords = backbone_system
        frames = jnp.asarray(
            np.stack([coords + rng.normal(0, 0.05, coords.shape) for _ in range(4)])
        )
        batched = jax.vmap(lambda p: total_energy(p, ff, config=REFERENCE_CONFIG))(
            frames
        )
        single_fn = jax.jit(
            lambda p: total_energy(p, ff, config=REFERENCE_CONFIG)
        )
        single = [float(single_fn(frames[i])) for i in range(4)]
        np.testing.assert_allclose(np.asarray(batched), single, rtol=1e-12)

    def test_gradients_flow_to_ff_params(self, backbone_system):
        """Training can differentiate wrt force-field parameters too."""
        top, ff, coords = backbone_system
        g = jax.jit(
            jax.grad(
                lambda bp: total_energy(
                    jnp.asarray(coords), ff.replace(bond_params=bp),
                    config=REFERENCE_CONFIG,
                )
            )
        )(ff.bond_params)
        assert bool(jnp.any(g != 0))


class TestUreyBradleyAuto:
    """REFERENCE_CONFIG must yield the complete CHARMM energy on chamber
    systems without caller flags (urey_bradley=None auto-enables when the FF
    carries UB springs)."""

    def test_chamber_system_includes_ub_by_default(self):
        from molecular_dynamics_tpu.examples import decaalanine_full
        from oracle import oracle_energy

        ff, coords, _ = decaalanine_full(dtype=jnp.float64)
        assert ff.ub_bonds.shape[0] > 0
        terms = jax.jit(
            lambda p: energy_terms(p, ff, config=REFERENCE_CONFIG)
        )(jnp.asarray(coords, jnp.float64))
        assert "urey_bradley" in terms
        want = oracle_energy(np.asarray(coords), ff)
        assert float(terms["urey_bradley"]) == pytest.approx(
            want["urey_bradley"], abs=1e-8
        )

    def test_explicit_false_wins(self):
        import dataclasses
        from molecular_dynamics_tpu.examples import decaalanine_full

        ff, coords, _ = decaalanine_full(dtype=jnp.float64)
        cfg = dataclasses.replace(REFERENCE_CONFIG, urey_bradley=False)
        terms = energy_terms(jnp.asarray(coords, jnp.float64), ff, config=cfg)
        assert "urey_bradley" not in terms
