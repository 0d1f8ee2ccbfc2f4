"""In-kernel GB-OBC implicit solvent: parity with the composed GB path.

The fused campaign kernel's ``gb=True`` passes (Born radii, Still pair
force, descreening chain rule) must reproduce the XLA composed path
(``solvent.gb_energy`` via ``energy_terms`` + ``jax.grad``) — the same
physics NAMD's ``gbis on`` applies during the reference data-generation
campaign (gendirs_GBIS.py:55-63).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu import (
    maxwell_boltzmann,
    minimize_fire,
    total_energy,
)
from molecular_dynamics_tpu import units
from molecular_dynamics_tpu.energy import GBIS_POLAR_CONFIG
from molecular_dynamics_tpu.ops.fused_step import (
    _hct_pair,
    _hct_pair_both,
    make_fused_campaign_op,
)


@pytest.fixture(scope="module")
def gb_system():
    from molecular_dynamics_tpu.examples import decaalanine_full

    ff, coords, _ = decaalanine_full()
    assert ff.has_gb
    force = lambda p: -jax.grad(
        lambda q: total_energy(q, ff, config=GBIS_POLAR_CONFIG)
    )(p)
    pos = jax.jit(
        lambda p: minimize_fire(
            p, force, n_steps=400, dt_start=1e-3, dt_max=1e-2
        )
    )(jnp.asarray(coords, jnp.float32))
    return ff, pos


class TestHCTPair:
    def test_integral_matches_born_radii(self, gb_system):
        """Dense (N, N) evaluation of _hct_pair reproduces the Born radii
        of solvent.born_radii exactly (same formulas, different layout)."""
        from molecular_dynamics_tpu.solvent import (
            GB_OFFSET,
            OBC_ALPHA,
            OBC_BETA,
            OBC_GAMMA,
            born_radii,
        )

        ff, pos = gb_system
        pos = pos.astype(jnp.float64)
        n = ff.n_atoms
        radii = jnp.asarray(ff.gb_radii, jnp.float64)
        rho = radii - GB_OFFSET
        s = jnp.asarray(ff.gb_screen, jnp.float64) * rho
        delta = pos[:, None, :] - pos[None, :, :]
        off = ~np.eye(n, dtype=bool)
        d2 = jnp.sum(delta * delta, axis=-1)
        d = jnp.sqrt(jnp.where(off, d2, 1.0))
        dinv = 1.0 / d
        integral, _ = _hct_pair(
            d, dinv, rho[:, None], (1.0 / rho)[:, None], s[None, :],
            jnp.asarray(off), False,
        )
        psi = 0.5 * rho * jnp.sum(integral, axis=1)
        th = jnp.tanh(psi * (OBC_ALPHA + psi * (-OBC_BETA + OBC_GAMMA * psi)))
        born = 1.0 / (1.0 / rho - th / radii)
        ref = born_radii(pos, ff)
        # ff.gb_radii is stored f32, so the two evaluations agree to the
        # f32 rounding floor, not machine-f64
        np.testing.assert_allclose(
            np.asarray(born), np.asarray(ref), rtol=5e-6
        )

    def test_both_directions_match_two_single_calls(self, gb_system):
        """_hct_pair_both (one shared reciprocal for the forward/reverse
        descreening directions) reproduces two _hct_pair calls to the f32
        rounding floor on real decaalanine geometry, including dead pairs."""
        from molecular_dynamics_tpu.solvent import GB_OFFSET

        ff, pos = gb_system
        pos = pos.astype(jnp.float32)
        n = ff.n_atoms
        radii = jnp.asarray(ff.gb_radii, jnp.float32)
        rho = radii - GB_OFFSET
        s = jnp.asarray(ff.gb_screen, jnp.float32) * rho
        delta = pos[:, None, :] - pos[None, :, :]
        off = jnp.asarray(~np.eye(n, dtype=bool))
        d2 = jnp.sum(delta * delta, axis=-1)
        d = jnp.sqrt(jnp.where(off, d2, 1.0))
        dinv = 1.0 / d
        rho_i, rhoi_i, s_i = rho[:, None], (1.0 / rho)[:, None], s[:, None]
        rho_j, rhoi_j, s_j = rho[None, :], (1.0 / rho)[None, :], s[None, :]
        i_f, di_f, i_r, di_r = _hct_pair_both(
            d, dinv, rho_i, rhoi_i, s_i, rho_j, rhoi_j, s_j, off, True
        )
        ref_f, ref_df = _hct_pair(d, dinv, rho_i, rhoi_i, s_j, off, True)
        ref_r, ref_dr = _hct_pair(d, dinv, rho_j, rhoi_j, s_i, off, True)
        for got, ref in ((i_f, ref_f), (di_f, ref_df),
                         (i_r, ref_r), (di_r, ref_dr)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-6, atol=2e-7
            )

    def test_derivative_matches_autodiff(self):
        """The hand-rolled dI/dd equals jax.grad of the integral across all
        piecewise regions (lo clamped at rho, |d-s| branch, inside-sphere
        correction)."""
        rho = jnp.float64(1.4)
        rho_inv = 1.0 / rho
        live = jnp.array(True)

        def integral_of(d, s):
            out, _ = _hct_pair(
                d, 1.0 / d, rho, rho_inv, s, live, False
            )
            return out

        for s in (0.3, 1.0, 2.5):  # s < rho, s ~ rho, s > rho (inside region)
            s = jnp.float64(s)
            # avoid the non-differentiable boundary points themselves
            for d in np.concatenate(
                [np.linspace(0.2, 6.0, 41), [s + 1e-3, s - 1e-3]]
            ):
                d = jnp.float64(abs(float(d)))
                _, dI = _hct_pair(d, 1.0 / d, rho, rho_inv, s, live, True)
                gref = jax.grad(integral_of)(d, s)
                np.testing.assert_allclose(
                    float(dI), float(gref), rtol=1e-8, atol=1e-12,
                    err_msg=f"d={float(d)}, s={float(s)}",
                )


class TestFusedGBCampaign:
    def test_single_step_matches_composed(self, gb_system):
        """One T=0 BAOAB step with in-kernel GB == the composed XLA step
        with GBIS_POLAR_CONFIG (Born radii + Still energy through
        jax.grad)."""
        ff, pos = gb_system
        n = ff.n_atoms
        adv = make_fused_campaign_op(
            ff, n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_POLAR_CONFIG.cutoff,
            switch_dist=GBIS_POLAR_CONFIG.switch_dist,
            rfa=GBIS_POLAR_CONFIG.rfa,
            solvent_dielectric=GBIS_POLAR_CONFIG.solvent_dielectric,
            gb=True,
            ion_concentration=GBIS_POLAR_CONFIG.ion_concentration,
            block_r=8, interpret=True,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        R = 4
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        pot = lambda q: total_energy(q, ff, config=GBIS_POLAR_CONFIG)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        p1, v1, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)

        dt = 1.0 / units.TIMEFACTOR
        gamma = 1.0 * (units.TIMEFACTOR / 1000.0)
        c1 = float(np.exp(-gamma * dt))
        m = jnp.asarray(ff.masses, jnp.float32)[:, None]
        vv = vel_b + 0.5 * dt * f0 / m
        xx = pos_b + 0.5 * dt * vv
        vv = c1 * vv
        xx = xx + 0.5 * dt * vv
        f_new = jax.vmap(lambda p: -jax.grad(pot)(p))(xx)
        vv = vv + 0.5 * dt * f_new / m

        np.testing.assert_allclose(np.asarray(p1), np.asarray(xx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(vv), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(f1), np.asarray(f_new), atol=0.15
        )

    def test_sasa_rejects_non_multiple_of_8_block(self, gb_system):
        """sasa=True with a block_r not divisible by 8 must fail loudly
        (the sub-chunk loop would otherwise leave scratch rows unwritten
        or hit StopIteration picking a chunk)."""
        from molecular_dynamics_tpu.energy import GBIS_CONFIG

        ff, _ = gb_system
        with pytest.raises(ValueError, match="multiple of 8"):
            make_fused_campaign_op(
                ff, n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
                cutoff=GBIS_CONFIG.cutoff,
                switch_dist=GBIS_CONFIG.switch_dist,
                rfa=GBIS_CONFIG.rfa,
                solvent_dielectric=GBIS_CONFIG.solvent_dielectric,
                gb=True, sasa=True,
                surface_tension=GBIS_CONFIG.surface_tension,
                block_r=12, interpret=True,
            )

    def test_chain_prod_layout_matches_mac(self, gb_system, monkeypatch):
        """The cached-products chain layout (MDX_GB_CHAIN=prod: Born pass
        stores dI·dx per direction, chain pass drops its coordinate rolls)
        produces the same step as the default scalar-cache MAC layout to
        the f32 rounding floor."""
        from molecular_dynamics_tpu.ops import fused_step

        ff, pos = gb_system
        n = ff.n_atoms
        kw = dict(
            n_inner=2, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_POLAR_CONFIG.cutoff,
            switch_dist=GBIS_POLAR_CONFIG.switch_dist,
            rfa=GBIS_POLAR_CONFIG.rfa,
            solvent_dielectric=GBIS_POLAR_CONFIG.solvent_dielectric,
            gb=True,
            ion_concentration=GBIS_POLAR_CONFIG.ion_concentration,
            block_r=8, interpret=True,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        R = 4
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        f0 = jnp.zeros_like(pos_b)
        outs = {}
        for layout in ("mac", "prod", "ilv2"):
            monkeypatch.setattr(
                fused_step, "_GB_CHAIN_PROD", layout == "prod"
            )
            monkeypatch.setattr(
                fused_step, "_GB_CHAIN_ILV", layout == "ilv2"
            )
            adv = make_fused_campaign_op(ff, **kw)
            outs[layout] = jax.jit(
                lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
            )(pos_b, vel_b, f0)
        for other in ("prod", "ilv2"):
            for a, b in zip(outs["mac"], outs[other]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-5,
                    err_msg=f"layout {other} vs mac",
                )

    def test_single_step_matches_composed_with_sasa(self, gb_system):
        """Full GBIS physics (gb + in-kernel dense LCPO SASA) == composed
        GBIS_CONFIG step at T=0 — the complete NAMD campaign force field
        in one kernel."""
        from molecular_dynamics_tpu.energy import GBIS_CONFIG

        ff, pos = gb_system
        n = ff.n_atoms
        adv = make_fused_campaign_op(
            ff, n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_CONFIG.cutoff,
            switch_dist=GBIS_CONFIG.switch_dist,
            rfa=GBIS_CONFIG.rfa,
            solvent_dielectric=GBIS_CONFIG.solvent_dielectric,
            gb=True,
            ion_concentration=GBIS_CONFIG.ion_concentration,
            sasa=True,
            surface_tension=GBIS_CONFIG.surface_tension,
            # 16 exercises the 8-row sub-chunk fori_loop of the dense
            # SASA pass (two chunks through the VMEM scratch refs)
            block_r=16, interpret=True,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        R = 4
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        pot = lambda q: total_energy(q, ff, config=GBIS_CONFIG)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        p1, v1, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)

        dt = 1.0 / units.TIMEFACTOR
        gamma = 1.0 * (units.TIMEFACTOR / 1000.0)
        c1 = float(np.exp(-gamma * dt))
        m = jnp.asarray(ff.masses, jnp.float32)[:, None]
        vv = vel_b + 0.5 * dt * f0 / m
        xx = pos_b + 0.5 * dt * vv
        vv = c1 * vv
        xx = xx + 0.5 * dt * vv
        f_new = jax.vmap(lambda p: -jax.grad(pot)(p))(xx)
        vv = vv + 0.5 * dt * f_new / m

        np.testing.assert_allclose(np.asarray(p1), np.asarray(xx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(vv), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(f1), np.asarray(f_new), atol=0.15
        )

    def test_gbis_protocol_campaign_runs(self, gb_system):
        """The full in-kernel GBIS protocol (GB + rigid bonds, 2 fs) stays
        finite and keeps constraints satisfied over a multi-step segment."""
        from molecular_dynamics_tpu.constraints import (
            hydrogen_bond_constraints,
        )

        ff, pos = gb_system
        n = ff.n_atoms
        cons = hydrogen_bond_constraints(ff)
        adv = make_fused_campaign_op(
            ff, n_inner=5, dt_fs=2.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_POLAR_CONFIG.cutoff,
            switch_dist=GBIS_POLAR_CONFIG.switch_dist,
            rfa=GBIS_POLAR_CONFIG.rfa,
            solvent_dielectric=GBIS_POLAR_CONFIG.solvent_dielectric,
            gb=True,
            ion_concentration=GBIS_POLAR_CONFIG.ion_concentration,
            constraints=cons,
            block_r=8, interpret=True,
        )
        vel = maxwell_boltzmann(jax.random.PRNGKey(0), ff.masses, 300.0)
        R = 4
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        pot = lambda q: total_energy(q, ff, config=GBIS_POLAR_CONFIG)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        p1, v1, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)
        assert np.isfinite(np.asarray(p1)).all()
        assert np.isfinite(np.asarray(v1)).all()
        assert np.isfinite(np.asarray(f1)).all()
        i, j = np.asarray(cons.pairs).T
        d = np.linalg.norm(
            np.asarray(p1)[:, i] - np.asarray(p1)[:, j], axis=-1
        )
        viol = np.abs(d - np.asarray(cons.lengths)[None, :])
        assert viol.max() < 1e-5, f"max violation {viol.max():.2e} A"


class TestKernelForceAccuracy:
    """VERDICT r2 #9: the 0.15 atol of the step-parity tests above is
    position-mismatch-bound (kernel and composed integrate in f32, so
    their post-step positions differ by ~1e-6 A, which stiff bonds amplify
    to ~0.1 kcal/mol/A of force difference). At *identical* positions the
    kernel's GB+SASA forces sit at the f32 summation floor — pinned here
    against an f64 composed reference."""

    def test_gb_sasa_forces_match_f64_composed_at_same_positions(
        self, gb_system
    ):
        from molecular_dynamics_tpu.energy import GBIS_CONFIG
        from molecular_dynamics_tpu.examples import decaalanine_full

        ff, pos = gb_system
        n = ff.n_atoms
        adv = make_fused_campaign_op(
            ff, n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_CONFIG.cutoff,
            switch_dist=GBIS_CONFIG.switch_dist,
            rfa=GBIS_CONFIG.rfa,
            solvent_dielectric=GBIS_CONFIG.solvent_dielectric,
            gb=True,
            ion_concentration=GBIS_CONFIG.ion_concentration,
            sasa=True,
            surface_tension=GBIS_CONFIG.surface_tension,
            block_r=8, interpret=True,
        )
        # T=0, zero velocity: the kernel's returned forces are evaluated
        # exactly at its own (deterministic) post-step positions
        pos_b = pos[None].astype(jnp.float32)
        vel_b = jnp.zeros((1, n, 3), jnp.float32)
        f32c = jax.jit(
            jax.grad(lambda q: -total_energy(q, ff, config=GBIS_CONFIG))
        )
        p1, _, f1 = jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f32c(pos_b[0])[None])

        ff64, _, _ = decaalanine_full(dtype=jnp.float64)
        fref = jax.grad(
            lambda q: -total_energy(q, ff64, config=GBIS_CONFIG)
        )(jnp.asarray(p1[0], jnp.float64))
        err_kernel = float(jnp.abs(f1[0] - fref).max())
        # composed f32 path at the same point: the f32 floor
        err_f32 = float(jnp.abs(f32c(p1[0]) - fref).max())
        # measured: kernel ~5.4e-4, composed-f32 ~1.4e-4 (forces O(76))
        assert err_kernel < 5e-3, err_kernel
        assert err_kernel < 40.0 * max(err_f32, 1e-5), (err_kernel, err_f32)


class TestPackedSASA:
    def test_packed_dense_pass_matches_unpacked(self, gb_system):
        """The two-replica lane packing of the dense LCPO pass (replica
        pair (i, i+pw) side by side on full 128-lane vregs, block-diagonal
        overlap mask) is a pure layout change: a T=0 step must match the
        unpacked pass at the f32 reduction floor on *distinct* replicas
        in both packing halves."""
        from molecular_dynamics_tpu.energy import GBIS_CONFIG

        ff, pos = gb_system
        n = ff.n_atoms
        kw = dict(
            n_inner=1, dt_fs=1.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_CONFIG.cutoff,
            switch_dist=GBIS_CONFIG.switch_dist,
            rfa=GBIS_CONFIG.rfa,
            solvent_dielectric=GBIS_CONFIG.solvent_dielectric,
            gb=True,
            ion_concentration=GBIS_CONFIG.ion_concentration,
            sasa=True,
            surface_tension=GBIS_CONFIG.surface_tension,
            block_r=16, interpret=True,
        )
        adv_packed = make_fused_campaign_op(ff, sasa_pack=True, **kw)
        adv_plain = make_fused_campaign_op(ff, sasa_pack=False, **kw)

        R = 16  # == block_r: halves hold replicas 0-7 / 8-15
        key = jax.random.PRNGKey(7)
        pos_b = (
            jnp.broadcast_to(pos, (R, n, 3))
            + 0.02 * jax.random.normal(key, (R, n, 3))
        ).astype(jnp.float32)
        vel_b = jnp.zeros((R, n, 3), jnp.float32)
        pot = lambda q: total_energy(q, ff, config=GBIS_CONFIG)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        step = lambda a: jax.jit(
            lambda x, v, f: a(x, v, f, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)
        p_a, v_a, f_a = step(adv_packed)
        p_b, v_b, f_b = step(adv_plain)
        np.testing.assert_allclose(
            np.asarray(p_a), np.asarray(p_b), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(f_a), np.asarray(f_b), atol=5e-3
        )


class TestSASAMultipleTimestepping:
    """``sasa_every=k`` (VERDICT r3 #1): the slow LCPO nonpolar force on
    the r-RESPA held-force cadence NAMD uses for its own slow forces.
    The schedule must be physically indistinguishable from every-step
    evaluation: a deterministic T=0 trajectory bound, an NVE (gamma=0)
    energy-drift bound, and a thermostatted statistics check (mirrored
    at campaign scale by scripts/regenerate_smd.py validation runs)."""

    def _vacuum_sasa_op(self, ff, **over):
        """Vacuum + SASA kernel (gb off keeps interpret-mode cost down;
        the cadence machinery is identical with gb on)."""
        from molecular_dynamics_tpu.energy import GBIS_CONFIG

        kw = dict(
            n_inner=10, dt_fs=2.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_CONFIG.cutoff,
            switch_dist=GBIS_CONFIG.switch_dist,
            rfa=GBIS_CONFIG.rfa,
            solvent_dielectric=GBIS_CONFIG.solvent_dielectric,
            sasa=True,
            surface_tension=GBIS_CONFIG.surface_tension,
            block_r=8, interpret=True,
        )
        kw.update(over)
        return make_fused_campaign_op(ff, **kw)

    def _state(self, ff, pos, R=2, kinetic=True):
        from molecular_dynamics_tpu.energy import GBIS_CONFIG
        import dataclasses as _dc

        n = ff.n_atoms
        cfg = _dc.replace(
            GBIS_CONFIG, terms=tuple(t for t in GBIS_CONFIG.terms if t != "gb")
        )
        vel = (
            maxwell_boltzmann(jax.random.PRNGKey(3), ff.masses, 300.0)
            if kinetic
            else jnp.zeros((n, 3))
        )
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        pot = lambda q: total_energy(q, ff, config=cfg)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        return pos_b, vel_b, f0, pot

    def test_held_force_trajectory_bound(self, gb_system):
        """T=0 (deterministic), 10 steps: holding the nonpolar force for 5
        steps deviates from the every-step trajectory by far less than a
        thermal fluctuation (the term is ~0.005 kcal/mol/A^2 * dA — the
        smallest force in the campaign)."""
        ff, pos = gb_system
        pos_b, vel_b, f0, _ = self._state(ff, pos, kinetic=True)
        run = lambda adv: jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)
        p1, v1, _ = run(self._vacuum_sasa_op(ff, sasa_every=1))
        p5, v5, _ = run(self._vacuum_sasa_op(ff, sasa_every=5))
        dev = float(jnp.max(jnp.abs(p5 - p1)))
        assert np.isfinite(np.asarray(p5)).all()
        assert dev < 5e-4, f"held-force deviation {dev:.2e} A over 10 steps"

    def test_invalid_cadence_rejected(self, gb_system):
        ff, _ = gb_system
        with pytest.raises(ValueError, match="must divide n_inner"):
            self._vacuum_sasa_op(ff, n_inner=10, sasa_every=3)

    def test_nve_energy_trace_matches_every_step(self, gb_system):
        """gamma=0, T=0 -> pure velocity Verlet: the *pointwise* total-
        energy trace with the k=5 hold tracks the every-step trace to
        well under the f32 integrator's own fluctuation (measured: the
        hold changes the 200-step trace by <0.01 kcal/mol while the
        integrator transient itself swings ~6 kcal/mol) — the held force
        neither pumps nor leaks energy."""
        from molecular_dynamics_tpu.integrate import kinetic_energy

        ff, pos = gb_system
        pos_b, vel_b, f0, pot = self._state(ff, pos, R=1, kinetic=True)

        def trace(adv, n_launch=2):
            p, v, f = pos_b, vel_b, f0
            es = []
            for i in range(n_launch):
                p, v, f = jax.jit(
                    lambda a, b, c: adv(
                        a, b, c, jnp.int32(0), jnp.int32(1 + i)
                    )
                )(p, v, f)
                es.append(float(pot(p[0]) + kinetic_energy(v[0], ff.masses)))
            return np.asarray(es)

        kw = dict(n_inner=50, dt_fs=1.0, gamma_ps=0.0)
        e1 = trace(self._vacuum_sasa_op(ff, sasa_every=1, **kw))
        e5 = trace(self._vacuum_sasa_op(ff, sasa_every=5, **kw))
        dev = float(np.max(np.abs(e5 - e1)))
        assert dev < 0.05, (
            f"MTS energy-trace deviation {dev:.4f} kcal/mol vs every-step"
        )

    def test_thermostatted_statistics_match(self, gb_system):
        """Langevin 300 K: mean temperature and radius of gyration over a
        short ensemble agree between cadences within sampling noise."""
        from molecular_dynamics_tpu.integrate import kinetic_energy

        ff, pos = gb_system
        R = 4
        pos_b, vel_b, f0, _ = self._state(ff, pos, R=R, kinetic=True)
        masses = jnp.asarray(ff.masses, jnp.float32)

        def stats(adv, launches=4):
            p, v, f = pos_b, vel_b, f0
            temps, rgs = [], []
            for i in range(launches):
                p, v, f = jax.jit(
                    lambda a, b, c: adv(
                        a, b, c, jnp.int32(0), jnp.int32(11 + i)
                    )
                )(p, v, f)
                ke = jax.vmap(lambda u: kinetic_energy(u, ff.masses))(v)
                temps.append(
                    np.asarray(2.0 * ke / (3 * ff.n_atoms * units.BOLTZMANN))
                )
                com = jnp.sum(
                    masses[:, None] * p, axis=1, keepdims=True
                ) / jnp.sum(masses)
                rg = jnp.sqrt(
                    jnp.sum(
                        masses[None, :] * jnp.sum((p - com) ** 2, -1), -1
                    )
                    / jnp.sum(masses)
                )
                rgs.append(np.asarray(rg))
            return np.mean(temps), np.mean(rgs)

        kw = dict(n_inner=20, temperature=300.0)
        t1, rg1 = stats(self._vacuum_sasa_op(ff, sasa_every=1, **kw))
        # k=5 is the bench default (1.058x north star); k=10 (1.144x) is
        # the documented aggressive option — both must hold the ensemble
        for k in (5, 10):
            tk, rgk = stats(self._vacuum_sasa_op(ff, sasa_every=k, **kw))
            assert abs(tk - t1) < 60.0, f"k={k}: T {t1:.1f} vs {tk:.1f} K"
            assert abs(rgk - rg1) < 0.25, (
                f"k={k}: Rg {rg1:.2f} vs {rgk:.2f} A"
            )


class TestGBMultipleTimestepping:
    """``gb_every=k``: impulse (Verlet-I/r-RESPA) MTS for the whole GB
    polar force — evaluated once per k-step block, applied as half-block
    velocity kicks at the block boundaries; per-step evals are the plain
    pair loop. Same soundness bar as the SASA cadence: deterministic
    trajectory bound, NVE energy-trace bound (the discriminating test:
    both naive held-quantity schedules fail it secularly — see the
    kernel docstring), thermostatted ensemble statistics."""

    def _gb_op(self, ff, **over):
        from molecular_dynamics_tpu.energy import GBIS_POLAR_CONFIG

        kw = dict(
            n_inner=10, dt_fs=2.0, temperature=0.0, gamma_ps=1.0,
            cutoff=GBIS_POLAR_CONFIG.cutoff,
            switch_dist=GBIS_POLAR_CONFIG.switch_dist,
            rfa=GBIS_POLAR_CONFIG.rfa,
            solvent_dielectric=GBIS_POLAR_CONFIG.solvent_dielectric,
            gb=True,
            ion_concentration=GBIS_POLAR_CONFIG.ion_concentration,
            block_r=8, interpret=True,
        )
        kw.update(over)
        return make_fused_campaign_op(ff, **kw)

    def _state(self, ff, pos, R=2):
        n = ff.n_atoms
        vel = maxwell_boltzmann(jax.random.PRNGKey(3), ff.masses, 300.0)
        pos_b = jnp.broadcast_to(pos, (R, n, 3)).astype(jnp.float32)
        vel_b = jnp.broadcast_to(vel, (R, n, 3)).astype(jnp.float32)
        pot = lambda q: total_energy(q, ff, config=GBIS_POLAR_CONFIG)
        f0 = jax.vmap(lambda p: -jax.grad(pot)(p))(pos_b)
        return pos_b, vel_b, f0, pot

    def test_held_radii_trajectory_bound(self, gb_system):
        """Impulse-splitting trajectory deviation vs the every-step path.

        The deviation is the r-RESPA splitting error, not noise — measured
        (x64 CPU, deterministic): k=2 3.5e-3 A / k=5 2.65e-2 A at dt=2 fs
        over 10 steps, and 6-8x smaller at dt=1 fs (the expected
        O((k dt)^2)-per-block scaling). Pin both the magnitudes (with 2x
        margin) and the k-scaling; the NVE energy-trace test below is the
        discriminating soundness check (naive held-force schedules drift
        secularly and fail it)."""
        ff, pos = gb_system
        pos_b, vel_b, f0, _ = self._state(ff, pos)
        run = lambda adv: jax.jit(
            lambda a, b, c: adv(a, b, c, jnp.int32(0), jnp.int32(1))
        )(pos_b, vel_b, f0)
        p1, _, _ = run(self._gb_op(ff, gb_every=1))
        p2, _, _ = run(self._gb_op(ff, gb_every=2))
        p5, _, _ = run(self._gb_op(ff, gb_every=5))
        dev2 = float(jnp.max(jnp.abs(p2 - p1)))
        dev5 = float(jnp.max(jnp.abs(p5 - p1)))
        assert np.isfinite(np.asarray(p5)).all()
        assert dev2 < 1e-2, f"k=2 splitting deviation {dev2:.2e} A"
        assert dev5 < 6e-2, f"k=5 splitting deviation {dev5:.2e} A"
        # quadratic-in-k splitting growth, not secular/unstable blowup
        assert dev5 < 25.0 * max(dev2, 1e-4), (dev2, dev5)

    def test_invalid_cadences_rejected(self, gb_system):
        ff, _ = gb_system
        with pytest.raises(ValueError, match="must divide n_inner"):
            self._gb_op(ff, n_inner=10, gb_every=3)
        with pytest.raises(ValueError, match="cadences must align"):
            self._gb_op(
                ff, n_inner=10, gb_every=5, sasa=True, sasa_every=2
            )

    def test_nve_energy_trace_matches_every_step(self, gb_system):
        from molecular_dynamics_tpu.integrate import kinetic_energy

        ff, pos = gb_system
        pos_b, vel_b, f0, pot = self._state(ff, pos, R=1)

        def trace(adv, n_launch=2):
            p, v, f = pos_b, vel_b, f0
            es = []
            for i in range(n_launch):
                p, v, f = jax.jit(
                    lambda a, b, c: adv(
                        a, b, c, jnp.int32(0), jnp.int32(1 + i)
                    )
                )(p, v, f)
                es.append(float(pot(p[0]) + kinetic_energy(v[0], ff.masses)))
            return np.asarray(es)

        kw = dict(n_inner=50, dt_fs=1.0, gamma_ps=0.0)
        e1 = trace(self._gb_op(ff, gb_every=1, **kw))
        # k=2: the impulse splitting tracks the every-step trace almost
        # exactly (measured +-0.02 kcal/mol over 300 steps); k=5 shows a
        # BOUNDED ~0.5 kcal/mol wobble with no secular term (the naive
        # held-radii / held-force schedules drift 10x that, monotonically)
        e2 = trace(self._gb_op(ff, gb_every=2, **kw))
        dev2 = float(np.max(np.abs(e2 - e1)))
        assert dev2 < 0.1, (
            f"impulse-MTS k=2 energy-trace deviation {dev2:.4f} kcal/mol"
        )
        e5 = trace(self._gb_op(ff, gb_every=5, **kw))
        dev5 = float(np.max(np.abs(e5 - e1)))
        assert dev5 < 1.0, (
            f"impulse-MTS k=5 energy-trace deviation {dev5:.4f} kcal/mol"
        )

    def test_thermostatted_statistics_match(self, gb_system):
        from molecular_dynamics_tpu.integrate import kinetic_energy
        from molecular_dynamics_tpu import units

        ff, pos = gb_system
        R = 4
        pos_b, vel_b, f0, _ = self._state(ff, pos, R=R)
        masses = jnp.asarray(ff.masses, jnp.float32)

        def stats(adv, launches=2):
            p, v, f = pos_b, vel_b, f0
            temps, rgs = [], []
            for i in range(launches):
                p, v, f = jax.jit(
                    lambda a, b, c: adv(
                        a, b, c, jnp.int32(0), jnp.int32(7 + i)
                    )
                )(p, v, f)
                ke = jax.vmap(lambda vv: kinetic_energy(vv, ff.masses))(v)
                temps.append(
                    np.asarray(2.0 * ke / (3 * ff.n_atoms * units.BOLTZMANN))
                )
                com = jnp.sum(
                    masses[:, None] * p, axis=1, keepdims=True
                ) / jnp.sum(masses)
                rg = jnp.sqrt(
                    jnp.sum(
                        masses[None, :] * jnp.sum((p - com) ** 2, -1), -1
                    )
                    / jnp.sum(masses)
                )
                rgs.append(np.asarray(rg))
            return np.mean(temps), np.mean(rgs)

        kw = dict(n_inner=20, temperature=300.0)
        t1, rg1 = stats(self._gb_op(ff, gb_every=1, **kw))
        t5, rg5 = stats(self._gb_op(ff, gb_every=5, **kw))
        assert abs(t5 - t1) < 60.0, f"T {t1:.1f} vs {t5:.1f} K"
        assert abs(rg5 - rg1) < 0.25, f"Rg {rg1:.2f} vs {rg5:.2f} A"
