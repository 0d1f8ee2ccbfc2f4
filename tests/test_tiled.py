"""Scalability oracle: m tiled copies of deca-alanine as ONE system.

The reference never exceeds 104 atoms (every script is a single molecule
— Test-6_full_system/potcalc.py). Tiling copies ``spacing >> cutoff``
apart gives an m-fold-larger system whose energy has an exact oracle
(m x the single-copy energy: cross-copy pairs are cutoff-suppressed),
exercising every kernel tier — dense pair tables, ring tables at a
larger n_pad, GB/SASA compact sets past the half-lane width — at sizes
the 104-atom fixtures cannot reach.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu import total_energy
from molecular_dynamics_tpu.energy import (
    GBIS_CONFIG,
    REFERENCE_CONFIG,
    energy_terms,
)
from molecular_dynamics_tpu.examples import decaalanine_full, tiled_decaalanine


class TestTiledOracle:
    def test_vacuum_terms_scale_exactly(self):
        """Every per-term energy of the 4x-tiled system == 4x the single
        system (f64; copies 60 A apart, cutoff 9 A => zero cross terms)."""
        m = 4
        ff1, c1, _ = decaalanine_full(dtype=jnp.float64)
        ffm, cm, meta = tiled_decaalanine(m, spacing=60.0, dtype=jnp.float64)
        assert ffm.n_atoms == m * ff1.n_atoms
        assert meta["tiled_copies"] == m
        t1 = energy_terms(
            jnp.asarray(c1, jnp.float64), ff1, config=REFERENCE_CONFIG
        )
        tm = energy_terms(
            jnp.asarray(cm, jnp.float64), ffm, config=REFERENCE_CONFIG
        )
        for k, v in t1.items():
            np.testing.assert_allclose(
                float(tm[k]), m * float(v), rtol=1e-9, atol=1e-7,
                err_msg=k,
            )

    def test_gbis_energy_scales(self):
        """GB-OBC + SASA also tile: SASA and the Born integrals are
        strictly local (measured 0 cross-copy contribution at 80 A), and
        the one non-local term — the composed path's *uncut* Still pair
        sum — leaves only the screened dipole-dipole tail between neutral
        copies (measured -0.037 kcal/mol of -425, bounded at 0.05)."""
        m = 3
        ff1, c1, _ = decaalanine_full(dtype=jnp.float64)
        ffm, cm, _ = tiled_decaalanine(m, spacing=80.0, dtype=jnp.float64)
        t1 = energy_terms(
            jnp.asarray(c1, jnp.float64), ff1, config=GBIS_CONFIG
        )
        tm = energy_terms(
            jnp.asarray(cm, jnp.float64), ffm, config=GBIS_CONFIG
        )
        for k, v in t1.items():
            tol = 0.05 if k == "gb" else 1e-7
            np.testing.assert_allclose(
                float(tm[k]), m * float(v), atol=tol, rtol=1e-9,
                err_msg=k,
            )

    def test_fused_kernel_runs_at_tiled_size(self):
        """The fused campaign kernel is correct at 2x the fixture size
        (n_pad 256, 128 ring shifts): single T=0 step matches the composed
        XLA path — the ring-table construction has no 104-atom baked-in
        assumptions."""
        from molecular_dynamics_tpu import units
        from molecular_dynamics_tpu.ops.fused_step import (
            make_fused_campaign_op,
        )

        m = 2
        ffm, cm, _ = tiled_decaalanine(m, spacing=40.0)
        n = ffm.n_atoms
        adv = make_fused_campaign_op(
            ffm, n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            cutoff=REFERENCE_CONFIG.cutoff,
            switch_dist=REFERENCE_CONFIG.switch_dist,
            rfa=REFERENCE_CONFIG.rfa,
            block_r=8, interpret=True,
        )
        pos_b = jnp.asarray(cm, jnp.float32)[None]
        vel_b = jnp.zeros((1, n, 3), jnp.float32)
        pot = lambda q: total_energy(q, ffm, config=REFERENCE_CONFIG)
        f0 = -jax.grad(pot)(pos_b[0])[None]
        p1, v1, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)

        dt = 1.0 / units.TIMEFACTOR
        gamma = 1.0 * (units.TIMEFACTOR / 1000.0)
        c1f = float(np.exp(-gamma * dt))
        mss = jnp.asarray(ffm.masses, jnp.float32)[:, None]
        vv = vel_b[0] + 0.5 * dt * f0[0] / mss
        xx = pos_b[0] + 0.5 * dt * vv
        vv = c1f * vv
        xx = xx + 0.5 * dt * vv
        f_new = -jax.grad(pot)(xx)
        vv = vv + 0.5 * dt * f_new / mss
        np.testing.assert_allclose(
            np.asarray(p1[0]), np.asarray(xx), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(f1[0]), np.asarray(f_new), atol=0.05
        )


class TestCampaignAutoDispatch:
    """simulate_ensemble silently routes oversized systems to the composed
    XLA path instead of a pathological fused kernel / VMEM crash
    (VERDICT r3 #2; measured tiers in docs/VALIDATION.md)."""

    def test_fits_predicate_tiers(self, monkeypatch):
        from molecular_dynamics_tpu.ops.fused_step import fused_campaign_fits

        monkeypatch.delenv("MDX_FUSED_FORCE", raising=False)
        assert fused_campaign_fits(104)   # reference scale: kernel tier
        assert fused_campaign_fits(208)   # 2 lane-tiles: parity-pinned tier
        assert fused_campaign_fits(416)   # measured 3.2x the composed path
        assert not fused_campaign_fits(1040)  # Mosaic compile pathological
        monkeypatch.setenv("MDX_FUSED_FORCE", "1")
        assert fused_campaign_fits(1040)

    def test_oversized_system_dispatches_composed(self, monkeypatch):
        import warnings as _w

        from molecular_dynamics_tpu import maxwell_boltzmann, system_init
        from molecular_dynamics_tpu.integrate import initialize_forces
        from molecular_dynamics_tpu.sim import (
            SimulationConfig,
            simulate_ensemble,
        )
        from molecular_dynamics_tpu.system import replicate

        monkeypatch.delenv("MDX_FUSED_FORCE", raising=False)
        ffm, cm, _ = tiled_decaalanine(8)  # 1040 atoms: composed tier
        cfg = SimulationConfig(
            dt_fs=0.5, fused_campaign=True, energy=REFERENCE_CONFIG
        )
        pos = jnp.asarray(cm, jnp.float32)
        key = jax.random.PRNGKey(0)
        state = system_init(
            pos, vel=maxwell_boltzmann(key, ffm.masses, 300.0), key=key
        )
        state = initialize_forces(
            state,
            lambda p, b: -jax.grad(
                lambda q: total_energy(q, ffm, config=REFERENCE_CONFIG)
            )(p),
        )
        ens = replicate(state, 2, seed=1)
        with pytest.warns(UserWarning, match="composed XLA path"):
            final, frames, _ = simulate_ensemble(
                ens, ffm, n_steps=4, save_every=2, config=cfg
            )
        assert np.isfinite(np.asarray(frames)).all()

        # at reference scale the fused kernel stays selected: no warning
        ff1, c1, _ = tiled_decaalanine(1)
        state1 = system_init(
            jnp.asarray(c1, jnp.float32),
            vel=maxwell_boltzmann(key, ff1.masses, 300.0), key=key,
        )
        state1 = initialize_forces(
            state1,
            lambda p, b: -jax.grad(
                lambda q: total_energy(q, ff1, config=REFERENCE_CONFIG)
            )(p),
        )
        ens1 = replicate(state1, 2, seed=1)
        with _w.catch_warnings():
            _w.simplefilter("error", UserWarning)
            simulate_ensemble(ens1, ff1, n_steps=4, save_every=2, config=cfg)


class TestDensePairMode:
    """Dense pair tier of the campaign kernel (VERDICT r3 #2): atoms ride
    both slab axes, no per-shift roll loop — the mid-size system tier."""

    @pytest.mark.parametrize("m", [1, 4])
    def test_dense_step_matches_composed(self, m):
        from molecular_dynamics_tpu import units
        from molecular_dynamics_tpu.ops.fused_step import (
            make_fused_campaign_op,
        )

        ffm, cm, _ = tiled_decaalanine(m)
        n = ffm.n_atoms
        adv = make_fused_campaign_op(
            ffm, n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            cutoff=REFERENCE_CONFIG.cutoff,
            switch_dist=REFERENCE_CONFIG.switch_dist,
            rfa=REFERENCE_CONFIG.rfa,
            pair_mode="dense", interpret=True,
        )
        pos_b = jnp.asarray(cm, jnp.float32)[None]
        vel_b = jnp.zeros((1, n, 3), jnp.float32)
        pot = lambda q: total_energy(q, ffm, config=REFERENCE_CONFIG)
        f0 = -jax.grad(pot)(pos_b[0])[None]
        p1, v1, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)

        dt = 1.0 / units.TIMEFACTOR
        gamma = 1.0 * (units.TIMEFACTOR / 1000.0)
        c1f = float(np.exp(-gamma * dt))
        mss = jnp.asarray(ffm.masses, jnp.float32)[:, None]
        vv = vel_b[0] + 0.5 * dt * f0[0] / mss
        xx = pos_b[0] + 0.5 * dt * vv
        vv = c1f * vv
        xx = xx + 0.5 * dt * vv
        f_new = -jax.grad(pot)(xx)
        np.testing.assert_allclose(
            np.asarray(p1[0]), np.asarray(xx), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(f1[0]), np.asarray(f_new), atol=0.05
        )

    def test_dense_mode_rejects_gb(self):
        from molecular_dynamics_tpu.ops.fused_step import (
            make_fused_campaign_op,
        )

        ffm, _, _ = tiled_decaalanine(1)
        if not ffm.has_gb:
            pytest.skip("example carries no GB tables")
        with pytest.raises(NotImplementedError, match="dense"):
            make_fused_campaign_op(
                ffm, pair_mode="dense", gb=True, interpret=True
            )

    def test_auto_mode_stays_ring(self):
        # dense is never auto-selected: its (BR, N, N) slabs fail the
        # Mosaic compile past ~2 lane-tiles (measured at 416 atoms)
        from molecular_dynamics_tpu.ops.fused_step import (
            make_fused_campaign_op,
        )

        ff4, _, _ = tiled_decaalanine(4)
        adv = make_fused_campaign_op(ff4, n_inner=1, interpret=True)
        assert adv.block_r == 64  # ring-mode default block
        advd = make_fused_campaign_op(
            ff4, n_inner=1, pair_mode="dense", interpret=True
        )
        assert advd.block_r == 8  # dense-mode default block
