"""GB-OBC II implicit solvent + LCPO SASA: oracle parity, forces, guards.

The reference's training data was generated with NAMD GBIS + SASA
(gendirs_GBIS.py:55-68); these tests pin the dense TPU formulation to an
independent scalar-loop numpy oracle and to analytic limits.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu import solvent
from molecular_dynamics_tpu.energy import (
    GBIS_CONFIG,
    REFERENCE_CONFIG,
    energy_terms,
    total_energy,
)

from oracle import oracle_born_radii, oracle_gb_energy, oracle_sasa


@pytest.fixture(scope="module")
def full64():
    from molecular_dynamics_tpu.examples import decaalanine_full

    ff, coords, _ = decaalanine_full(dtype=jnp.float64)
    return ff, np.asarray(coords, np.float64)


class TestBornRadii:
    def test_isolated_atom_limit(self, full64):
        """With all neighbors far away, R_i -> rho_i = r_i - offset."""
        ff, coords = full64
        spread = jnp.asarray(coords * 1e3)  # atoms ~1000 A apart
        born = np.asarray(solvent.born_radii(spread, ff))
        rho = np.asarray(ff.gb_radii) - solvent.GB_OFFSET
        np.testing.assert_allclose(born, rho, rtol=1e-6)

    def test_matches_oracle(self, full64):
        ff, coords = full64
        born = np.asarray(
            jax.jit(lambda p: solvent.born_radii(p, ff))(jnp.asarray(coords))
        )
        want = oracle_born_radii(coords, ff)
        np.testing.assert_allclose(born, want, rtol=1e-10)
        # effective radii exceed the intrinsic lower bound and stay physical
        assert (born >= np.asarray(ff.gb_radii) - solvent.GB_OFFSET - 1e-9).all()
        assert (born < 100.0).all()


class TestGBEnergy:
    def test_matches_oracle(self, full64):
        ff, coords = full64
        got = float(
            jax.jit(
                lambda p: solvent.gb_energy(
                    p, ff, solvent_dielectric=80.0, ion_concentration=0.1
                )
            )(jnp.asarray(coords))
        )
        want = oracle_gb_energy(
            coords, ff, solvent_dielectric=80.0, ion_concentration=0.1
        )
        assert got == pytest.approx(want, abs=1e-8)
        # polar solvation of a charged solute is strongly negative
        assert got < -10.0

    def test_salt_stabilizes_charged_solute(self, full64):
        # Debye screening deepens the solvation of a net-charged solute
        # (the Debye-Hueckel limiting law); 0.1 M matches the campaign's
        # ``ionconcentration 0.1`` (gendirs_GBIS.py:62)
        ff, coords = full64
        pos = jnp.asarray(coords)
        e0 = float(solvent.gb_energy(pos, ff, 80.0, ion_concentration=0.0))
        e1 = float(solvent.gb_energy(pos, ff, 80.0, ion_concentration=0.1))
        assert e1 < e0 < 0.0


class TestSASA:
    def test_isolated_atom_is_full_sphere(self, full64):
        ff, coords = full64
        spread = jnp.asarray(coords * 1e3)
        areas = np.asarray(solvent.sasa(spread, ff))
        radii = np.asarray(ff.sasa_radii)
        p1 = np.asarray(ff.sasa_params)[:, 0]
        want = np.where(radii > 0, p1 * 4.0 * np.pi * radii**2, 0.0)
        np.testing.assert_allclose(areas, want, rtol=1e-6)
        assert (areas[radii == 0] == 0).all()  # H united out

    def test_matches_oracle(self, full64):
        ff, coords = full64
        got = np.asarray(
            jax.jit(lambda p: solvent.sasa(p, ff))(jnp.asarray(coords))
        )
        want = oracle_sasa(coords, ff)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


class TestGBISConfig:
    def test_energy_terms_include_gb_and_sasa(self, full64):
        ff, coords = full64
        terms = jax.jit(
            lambda p: energy_terms(p, ff, config=GBIS_CONFIG)
        )(jnp.asarray(coords))
        assert "gb" in terms and "sasa" in terms
        assert float(terms["gb"]) < 0.0
        assert float(terms["sasa"]) > 0.0
        # GBIS electrostatics is plain Coulomb at eps=1 (GB supplies the
        # reaction field): differs from the RFA vacuum config
        vac = energy_terms(jnp.asarray(coords), ff, config=REFERENCE_CONFIG)
        assert float(terms["electrostatics"]) != pytest.approx(
            float(vac["electrostatics"])
        )

    def test_forces_match_finite_differences(self, full64):
        ff, coords = full64
        f = jax.jit(lambda p: total_energy(p, ff, config=GBIS_CONFIG))
        g = jax.jit(jax.grad(lambda p: total_energy(p, ff, config=GBIS_CONFIG)))
        pos = jnp.asarray(coords)
        grad = np.asarray(g(pos))
        eps = 1e-6
        for atom, dim in [(0, 0), (13, 1), (51, 2), (103, 0)]:
            pp = coords.copy()
            pm = coords.copy()
            pp[atom, dim] += eps
            pm[atom, dim] -= eps
            fd = (float(f(jnp.asarray(pp))) - float(f(jnp.asarray(pm)))) / (
                2 * eps
            )
            assert grad[atom, dim] == pytest.approx(fd, rel=1e-5, abs=1e-5)

    def test_vmap_and_grad_compose(self, full64):
        ff, coords = full64
        batch = jnp.stack([jnp.asarray(coords), jnp.asarray(coords) * 1.01])
        e = jax.jit(
            jax.vmap(lambda p: total_energy(p, ff, config=GBIS_CONFIG))
        )(batch)
        assert e.shape == (2,) and bool(jnp.all(jnp.isfinite(e)))

    def test_missing_tables_raise(self, full64):
        ff, coords = full64
        bare = ff.replace(
            gb_radii=None, gb_screen=None, sasa_radii=None, sasa_params=None
        )
        with pytest.raises(ValueError, match="attach_gb_params"):
            energy_terms(jnp.asarray(coords), bare, config=GBIS_CONFIG)


class TestElementInference:
    def test_names_win_over_masses_for_backbone(self):
        # the reference's backbone YAML gives N a carbon mass (12.011); the
        # atom name must still map it to element N
        els = solvent.infer_elements(
            [12.011, 12.011, 12.011, 15.999], ["N", "CA", "C", "O"]
        )
        assert list(els) == ["N", "C", "C", "O"]

    def test_mass_fallback(self):
        els = solvent.infer_elements([1.008, 14.01, 32.06])
        assert list(els) == ["H", "N", "S"]


class TestGBISCampaignPath:
    def test_short_ensemble_rollout(self):
        """GBIS + rigid-H ensemble dynamics (the NAMD campaign protocol)
        stays finite and thermalized on the composed path."""
        import molecular_dynamics_tpu as mdx
        from molecular_dynamics_tpu.examples import decaalanine_full
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.sim import (
            SimulationConfig,
            simulate_ensemble,
        )
        from molecular_dynamics_tpu.system import replicate

        ff, coords, _ = decaalanine_full(dtype=jnp.float32)
        cfg_e = GBIS_CONFIG
        force = jax.jit(
            lambda p: -jax.grad(lambda q: total_energy(q, ff, config=cfg_e))(p)
        )
        pos = jax.jit(
            lambda p: mdx.minimize_fire(
                p, lambda q: force(q), n_steps=300, dt_start=1e-3, dt_max=1e-2
            )
        )(jnp.asarray(coords, jnp.float32))
        key = jax.random.PRNGKey(0)
        state = mdx.system_init(
            pos, vel=mdx.maxwell_boltzmann(key, ff.masses, 300.0), key=key
        )
        state = initialize_forces(state, lambda p, b: force(p))
        ens = replicate(state, 2, seed=1)
        # fused_campaign=False: the GBIS term set now runs in the fused
        # kernel (tests/test_fused_gb.py covers it in interpret mode);
        # this test pins the composed XLA path the trainers differentiate
        sim_cfg = SimulationConfig(
            dt_fs=2.0, energy=cfg_e, constrain_h_bonds=True,
        )
        final, frames, log = simulate_ensemble(ens, ff, 100, 25, sim_cfg)
        assert bool(jnp.all(jnp.isfinite(frames)))
        t_end = float(np.asarray(log["T"])[-1].mean())
        assert 50.0 < t_end < 600.0  # thermalized, not exploded
