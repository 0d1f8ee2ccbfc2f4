"""Fully-fused Langevin campaign kernel: N integrator steps per launch.

The speed-of-light design for the reference's inner MD loop (NAMD's C++
core, SURVEY.md §2.12): positions, velocities and forces stay resident in
VMEM across ``n_inner`` BAOAB steps — HBM sees the state only once per
launch. Everything the step needs happens inside one Pallas program:

- pair terms via the shared ring-shift loop (``ops.ring.ring_pair_forces``),
- angles/torsions with **analytic** force distribution (the OpenMM-style
  formulas the reference uses, TorchMD_Fix/forces.py:519-535,581-600),
  gather/scatter as in-kernel MXU matmuls against static difference
  matrices,
- the moving harmonic SMD bias force (group-weight row reductions),
- BAOAB kicks/drifts and the O-step Gaussian noise from the on-core PRNG
  (``pltpu.prng_random_bits`` + Box-Muller),
- optional SHAKE/RATTLE bond constraints (NAMD ``rigidBonds all``,
  gendirs_GBIS.py:66): the Jacobi projection sweeps of ``constraints.py``
  become MXU matmuls — constraint-pair differences via a static {+1, -1}
  gather matrix, Lagrange corrections scattered back through its
  mass-weighted transpose — mirroring ``constrained_langevin_step`` exactly
  (g-BAOAB ordering: velocities re-projected after every kick and the
  O-step, positions after every drift).

Simulation-only fast path: not differentiable (training uses the composed
fused/XLA paths, which are). Physics parity with those paths is pinned by
tests (single-step force match, NVE drift, thermostat temperature).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from molecular_dynamics_tpu import units
from molecular_dynamics_tpu.ff.params import FFParams
from molecular_dynamics_tpu.ops.nonbonded import LANE
from molecular_dynamics_tpu.ops.ring import build_ring_tables, ring_pair_forces

_EPS = 1e-12

#: unroll factor of the GB ring-pass shift loops. Mosaic's scan lowering
#: supports ONLY unroll=1 or a full unroll (NotImplementedError otherwise),
#: and the full 64-shift unroll x3 passes explodes compile time — so 1.
_GB_UNROLL = 1
#: statically unroll the Born pass's 64-shift sweep for Mosaic (the chain
#: pass's unroll was worth 0.81 -> 1.03 M agg steps/s; the Born body is
#: ~4x heavier, so compile cost is the tradeoff — knob for A/B)
_GB_STATIC_BORN = os.environ.get("MDX_GB_STATIC_BORN", "1") == "1"
#: perf-ablation knob (debug only, physics-breaking; parity tests run ""):
#: "noborn" replaces the Born/HCT pass with constant radii (and skips the
#: chain pass, which consumes its cached dI rows), "nochain" skips only
#: the descreening chain-rule pass, "nostill" drops the Still pair force
#: from the main ring loop — isolates each GB sub-pass's step cost.
_GB_ABLATE = os.environ.get("MDX_GB_ABLATE", "")
#: chain-pass layout. "mac" (default): the Born pass caches the scalar
#: mrow*dI*rinv per shift and the chain pass recomputes dx/dy/dz from
#: rolled coordinates. "prod": the Born pass caches the three dI·dx
#: force-direction products per integral direction (6 scratch rows, 3x
#: the VMEM) and the chain pass drops its coordinate rolls entirely —
#: trades scratch traffic for the cross-lane shuffle port (measured
#: slower: 899.6k vs 910.2k full campaign). "ilv2": two interleaved
#: streams (even/odd shifts) halve the cross-shift roll dependency
#: chains at the same total roll count — a latency-vs-throughput probe.
#: Same math every way, parity-pinned (tests/test_fused_gb.py).
_GB_CHAIN = os.environ.get("MDX_GB_CHAIN", "mac")
_GB_CHAIN_PROD = _GB_CHAIN == "prod"
_GB_CHAIN_ILV = _GB_CHAIN == "ilv2"

_PI = 3.14159265358979
_HALF_PI = 1.5707963267949


def _atan2(y, x):
    """Four-quadrant arctangent for the kernel (no Mosaic atan2 lowering).

    Minimax odd polynomial for atan on [0, 1] (max err ~2e-7, plenty for
    f32) + standard quadrant/octant reduction.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, 1e-30)
    t2 = t * t
    p = t * (
        0.99997726
        + t2
        * (
            -0.33262347
            + t2
            * (
                0.19354346
                + t2
                * (-0.11643287 + t2 * (0.05265332 + t2 * -0.01172120))
            )
        )
    )
    r = jnp.where(ay > ax, _HALF_PI - p, p)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _angle_tables(ff: FFParams, n_pad: int):
    """Difference matrices + params for angles, padded to 128-row tiles."""
    from molecular_dynamics_tpu.ops.bonded import _diff_matrix_t, _pad_rows

    angles = np.asarray(ff.angles)
    rows = _pad_rows(len(angles)) if len(angles) else 0
    if not rows:
        return None
    pad = rows - len(angles)
    idx = np.concatenate([angles, np.tile([[0, 1, 2]], (pad, 1))])
    k0 = np.concatenate([np.asarray(ff.angle_params)[:, 0], np.zeros(pad)])
    t0 = np.concatenate([np.asarray(ff.angle_params)[:, 1], np.zeros(pad)])
    d21 = _diff_matrix_t(n_pad, idx[:, 0], idx[:, 1], rows)  # (L, A)
    d23 = _diff_matrix_t(n_pad, idx[:, 2], idx[:, 1], rows)
    return (
        jnp.asarray(d21), jnp.asarray(d23),
        jnp.asarray(d21.T.copy()), jnp.asarray(d23.T.copy()),
        jnp.asarray(k0[None, :], jnp.float32),
        jnp.asarray(t0[None, :], jnp.float32),
    )


def _torsion_tables(ff: FFParams, n_pad: int):
    """Difference matrices + padded multi-term params for dihedrals+impropers."""
    from molecular_dynamics_tpu.ops.bonded import _diff_matrix_t, _pad_rows

    blocks = []
    max_t = 1
    for idx_arr, par, msk in (
        (ff.dihedrals, ff.dihedral_params, ff.dihedral_term_mask),
        (ff.impropers, ff.improper_params, ff.improper_term_mask),
    ):
        idx_arr = np.asarray(idx_arr)
        if len(idx_arr):
            blocks.append((idx_arr, np.asarray(par), np.asarray(msk)))
            max_t = max(max_t, np.asarray(par).shape[1])
    if not blocks:
        return None

    def widen(par, msk):
        t = par.shape[1]
        if t == max_t:
            return par, msk
        extra = max_t - t
        pad_par = np.zeros((par.shape[0], extra, 3), par.dtype)
        pad_par[:, :, 2] = 1.0
        return (
            np.concatenate([par, pad_par], axis=1),
            np.concatenate([msk, np.zeros((msk.shape[0], extra), bool)], 1),
        )

    idx_all = np.concatenate([b[0] for b in blocks])
    widened = [widen(b[1], b[2]) for b in blocks]
    par_all = np.concatenate([w[0] for w in widened])
    msk_all = np.concatenate([w[1] for w in widened])
    rows = _pad_rows(len(idx_all))
    pad = rows - len(idx_all)
    idx_all = np.concatenate([idx_all, np.tile([[0, 1, 2, 3]], (pad, 1))])
    pad_par = np.zeros((pad, max_t, 3), par_all.dtype)
    pad_par[:, :, 2] = 1.0
    par_all = np.concatenate([par_all, pad_par])
    msk_all = np.concatenate([msk_all, np.zeros((pad, max_t), bool)])

    d12 = _diff_matrix_t(n_pad, idx_all[:, 0], idx_all[:, 1], rows)
    d23 = _diff_matrix_t(n_pad, idx_all[:, 1], idx_all[:, 2], rows)
    d34 = _diff_matrix_t(n_pad, idx_all[:, 2], idx_all[:, 3], rows)
    k = np.where(msk_all, par_all[:, :, 0], 0.0).T.astype(np.float32)
    phi0 = par_all[:, :, 1].T.astype(np.float32)  # (MAXT, T)
    per = par_all[:, :, 2].T.astype(np.float32)
    return (
        jnp.asarray(d12), jnp.asarray(d23), jnp.asarray(d34),
        jnp.asarray(d12.T.copy()), jnp.asarray(d23.T.copy()),
        jnp.asarray(d34.T.copy()),
        jnp.asarray(k), jnp.asarray(phi0), jnp.asarray(per), max_t,
    )


def _hct_bounds(d, s_j, rho_i, live):
    """Integration bounds of the HCT descreening integral for one
    direction: lo/up sanitized to 1 on dead pairs, plus the masks the
    tail evaluation needs."""
    up = d + s_j
    dm = d - s_j
    ad = jnp.abs(dm)
    use_rho = ad < rho_i
    lo = jnp.where(use_rho, rho_i, ad)
    contrib = live & (rho_i < up)
    up_s = jnp.where(contrib, up, 1.0)
    lo_s = jnp.where(contrib, lo, 1.0)
    return lo_s, up_s, contrib, use_rho, dm


def _hct_pair(d, dinv, rho_i, rho_inv_i, s_j, live, deriv: bool):
    """HCT pairwise-descreening integral I(d) (and optionally dI/dd).

    Identical math to ``solvent.born_radii`` (the OBC II descreening sum):
    atom i (intrinsic radius-offset ``rho_i``) descreened by atom j's scaled
    sphere ``s_j``. ``dinv`` must be a safe 1/d (callers pass 1 where the
    pair is dead); results are zeroed outside ``live``/``contrib``. The
    derivative is the exact piecewise-analytic d/dd of the integral — the
    same function jax.grad of the composed path produces a.e.
    """
    lo_s, up_s, contrib, use_rho, dm = _hct_bounds(d, s_j, rho_i, live)
    # one reciprocal feeds both bounds: 1/lo = (1/(lo*up))*up etc. —
    # reciprocals are multi-cycle on the VPU, multiplies are not
    pr = 1.0 / (lo_s * up_s)
    return _hct_tail(
        d, dinv, rho_i, rho_inv_i, s_j, pr, lo_s, up_s, contrib, use_rho,
        dm, deriv,
    )


def _hct_pair_both(d, dinv, rho_i, rho_inv_i, s_i,
                   rho_j, rho_inv_j, s_j, live, deriv: bool):
    """Both HCT descreening directions of one pair — forward (atom i
    descreened by j's scaled sphere ``s_j``) and reverse (j descreened by
    ``s_i``) — sharing ONE reciprocal: 1/(lo_f·up_f) and 1/(lo_r·up_r)
    are recovered from 1/(a·b) with two multiplies, trading a multi-cycle
    VPU reciprocal for three single-cycle multiplies (ulp-level rounding
    difference only; parity vs two ``_hct_pair`` calls is pinned in
    tests/test_fused_gb.py).

    Returns ``(i_f, di_f, i_r, di_r)`` (the d-terms are None without
    ``deriv``).
    """
    lo_f, up_f, c_f, ur_f, dm_f = _hct_bounds(d, s_j, rho_i, live)
    lo_r, up_r, c_r, ur_r, dm_r = _hct_bounds(d, s_i, rho_j, live)
    a = lo_f * up_f
    b = lo_r * up_r
    inv = 1.0 / (a * b)
    i_f, di_f = _hct_tail(
        d, dinv, rho_i, rho_inv_i, s_j, inv * b, lo_f, up_f, c_f, ur_f,
        dm_f, deriv,
    )
    i_r, di_r = _hct_tail(
        d, dinv, rho_j, rho_inv_j, s_i, inv * a, lo_r, up_r, c_r, ur_r,
        dm_r, deriv,
    )
    return i_f, di_f, i_r, di_r


def _hct_tail(d, dinv, rho_i, rho_inv_i, s_j, pr, lo_s, up_s, contrib,
              use_rho, dm, deriv: bool):
    ui = pr * lo_s
    li = pr * up_s
    s2d = s_j * s_j * dinv
    lnlu = jnp.log(lo_s * ui)
    half_ln_dinv = 0.5 * lnlu * dinv
    # rho_i < s_j - d  ⟺  dm < -rho_i  (reuses the bounds' d - s_j)
    inside = contrib & (dm < -rho_i)
    ui2 = ui * ui
    li2 = li * li
    dsum = ui2 - li2
    dd = d - s2d
    integral = li - ui + 0.25 * dd * dsum + half_ln_dinv
    integral = integral + jnp.where(
        inside, 2.0 * (rho_inv_i - li), 0.0
    )
    integral = jnp.where(contrib, integral, 0.0)
    if not deriv:
        return integral, None
    lop = jnp.where(
        use_rho, 0.0, jnp.where(dm > 0.0, 1.0, -1.0)
    )  # dlo/dd
    w = lop * li  # shared across the lop*li / lop*li^2 / lop*li^3 terms
    wli = w * li
    dI = (
        ui2 - wli
        + 0.25 * (1.0 + s2d * dinv) * dsum
        + 0.5 * dd * (wli * li - ui2 * ui)
        + (0.5 * (w - ui) - half_ln_dinv) * dinv
    )
    dI = dI + jnp.where(inside, 2.0 * wli, 0.0)
    dI = jnp.where(contrib, dI, 0.0)
    return integral, dI


def _gb_tables(ff: FFParams, n_pad: int):
    """Ring-layout GB tables (OBC II + Still pair energy, solvent.py).

    GB has *no* exclusions: every real-real pair contributes to the Born
    integral and the Still sum, so the mask/charge tables are dense over
    real atoms (0.5 on the halfway shift row, which visits each pair twice).
    Ghost lanes get rho=1, s=0, q=0 — inert by construction.
    """
    from molecular_dynamics_tpu.solvent import GB_OFFSET

    n = ff.n_atoms
    n_shifts = n_pad // 2
    radii = np.ones(n_pad, np.float32)
    radii[:n] = np.asarray(ff.gb_radii, np.float32)
    screen = np.zeros(n_pad, np.float32)
    screen[:n] = np.asarray(ff.gb_screen, np.float32)
    q = np.zeros(n_pad, np.float32)
    q[:n] = np.asarray(ff.charges, np.float32)
    rho = radii - GB_OFFSET
    rho[n:] = 1.0
    s = screen * rho
    real = np.zeros(n_pad, np.float32)
    real[:n] = 1.0

    i_idx = np.arange(n_pad)

    def ring_rows(vec):
        rows = np.zeros((n_shifts, n_pad), np.float32)
        for k in range(1, n_shifts + 1):
            rows[k - 1] = vec[(i_idx + k) % n_pad]
        return rows

    gm = ring_rows(real) * real[None, :]
    gm[n_shifts - 1] *= 0.5
    qqg = units.ELEC_FACTOR * q[None, :] * ring_rows(q)
    qqg[n_shifts - 1] *= 0.5
    shift_tables = (qqg, gm, ring_rows(s), ring_rows(rho), ring_rows(1.0 / rho))
    lane_tables = (
        rho[None, :],
        (1.0 / rho)[None, :],
        s[None, :],
        (1.0 / radii)[None, :],
        (units.ELEC_FACTOR * q * q)[None, :],
    )
    return (
        tuple(jnp.asarray(t, jnp.float32) for t in shift_tables),
        tuple(jnp.asarray(t, jnp.float32) for t in lane_tables),
    )


def _sasa_tables(ff: FFParams, n_pad: int, pack: int = 1):
    """LCPO tables for the in-kernel dense SASA pass, on the *compact*
    heavy-atom set.

    LCPO only involves atoms with a nonzero SASA radius (hydrogens carry
    rho=0, Weiser et al. table 2 / NAMD LCPO), so the dense pairwise pass
    runs over a compacted index set of width ``lc`` (~51 of decaalanine's
    104 atoms, padded to a multiple of 8): every elementwise (CH, lc, lc)
    tensor and every MXU contraction shrinks ~4x/8x vs the full (CH, L, L)
    pass. ``sel`` (L, lc) / ``selt`` (lc, L) are exact 0/1 gather/scatter
    matrices (applied at HIGHEST precision, so the compaction is bit-exact
    on the selected lanes). Column-shaped (lc, 1) copies put per-atom-p
    values on sublanes (W's row index) without any in-kernel transpose;
    the (1, lc) row covers the partner index q. ``a0col`` folds the
    constant P1*4*pi*r^2 term. Pad columns gather coordinate 0 with radius
    0: ghost-ghost pairs die on the d2>0 guard, ghost-real pairs on the
    overlap test (d < r_p + 0 requires d < |r_p - 0|).

    ``pack=2`` sizes the per-atom tables for the two-replica lane packing:
    ``lc`` is pinned at half the VPU lane width and every per-atom
    column/row table is duplicated to width ``2*lc``, so a dense slab
    holds replica pair (i, i+pw) side by side on full 128-lane vregs
    (the gather/scatter matrices stay at ``lc`` — they apply per half).
    """
    n = ff.n_atoms
    radii_full = np.zeros(n_pad, np.float32)
    radii_full[:n] = np.asarray(ff.sasa_radii, np.float32)
    active = np.nonzero(radii_full > 0.0)[0]
    nc = len(active)
    lc = max(8, ((nc + 7) // 8) * 8)
    if pack == 2:
        if lc > LANE // 2:
            raise ValueError("pack=2 needs a compact set <= half the lanes")
        lc = LANE // 2
    sel = np.zeros((n_pad, lc), np.float32)
    sel[active, np.arange(nc)] = 1.0
    radii = np.zeros(lc, np.float32)
    radii[:nc] = radii_full[active]
    p_full = np.zeros((n_pad, 4), np.float32)
    p_full[:n] = np.asarray(ff.sasa_params, np.float32)
    p = np.zeros((lc, 4), np.float32)
    p[:nc] = p_full[active]
    a0 = p[:, 0] * 4.0 * np.pi * radii * radii
    rep = lambda v: np.concatenate([v] * pack)
    col = lambda v: jnp.asarray(rep(v)[:, None], jnp.float32)  # (pack*lc, 1)
    return (
        jnp.asarray(sel), jnp.asarray(sel.T),
        col(radii),
        jnp.asarray(rep(radii)[None, :], jnp.float32),  # (1, pack*lc)
        col(a0), col(p[:, 1]), col(p[:, 2]), col(p[:, 3]),
    ), lc


def _constraint_tables(cons, n_pad: int):
    """Gather/scatter matrices + lane rows for the in-kernel projections.

    ``cd`` (n_pad, C_pad): column c = e_i - e_j — one matmul extracts every
    constraint-pair difference. ``cs`` (C_pad, n_pad): row c carries -w_i at
    atom i and +w_j at atom j (w = inverse mass), so ``p + corr @ cs`` is the
    mass-weighted SHAKE/RATTLE scatter of ``constraints.py:118-119``. Padded
    constraints have zero scatter rows (inert by construction).
    """
    c = int(cons.pairs.shape[0])
    c_pad = max(LANE, ((c + LANE - 1) // LANE) * LANE)
    pairs = np.asarray(cons.pairs)
    li, lj = pairs[:, 0], pairs[:, 1]
    inv_mass = np.asarray(cons.inv_mass)
    wi, wj = inv_mass[li], inv_mass[lj]
    r = np.arange(c)
    cd = np.zeros((n_pad, c_pad), np.float32)
    cd[li, r] += 1.0
    cd[lj, r] -= 1.0
    cs = np.zeros((c_pad, n_pad), np.float32)
    cs[r, li] = -wi
    cs[r, lj] = wj
    wsum = np.ones((1, c_pad), np.float32)
    wsum[0, :c] = wi + wj
    winv = np.zeros((1, c_pad), np.float32)
    winv[0, :c] = 1.0 / (wi + wj)
    d0sq = np.ones((1, c_pad), np.float32)
    d0sq[0, :c] = np.asarray(cons.lengths) ** 2
    return tuple(jnp.asarray(a) for a in (cd, cs, wsum, winv, d0sq)), c_pad


def _mm(a, b):
    """In-kernel full-precision MXU matmul (Mosaic supports DEFAULT/HIGHEST)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def fused_campaign_fits(n_atoms: int) -> bool:
    """Whether the VMEM-resident campaign kernel is the right tier for a
    system of ``n_atoms``.

    The kernel's design point is the replica-campaign regime: whole-system
    state plus pair/shift/bonded tables stay VMEM-resident across
    ``n_inner`` steps. With the 96 MB scoped-VMEM budget this wins at
    every size that compiles: 104 atoms 2.2M agg steps/s (vs 1.02M
    composed), 416 atoms 259.8k (vs 82.4k composed-XLA) — but past ~4
    lane-tiles of atoms the Mosaic compile itself becomes pathological
    (measured: 1,040 atoms never finishes compiling and can crash the
    TPU worker). ``simulate_ensemble`` auto-dispatches on this predicate
    so a scaled-up molecule silently takes the composed-XLA path instead
    of a compile hang; set ``MDX_FUSED_FORCE=1`` to force the kernel
    anyway (tier measurements, tests). Measured tiers:
    docs/VALIDATION.md system-size table.
    """
    if os.environ.get("MDX_FUSED_FORCE", "0") == "1":
        return True
    n_pad = ((n_atoms + LANE - 1) // LANE) * LANE
    return n_pad <= 4 * LANE


def make_fused_campaign_op(
    ff: FFParams,
    n_inner: int = 50,
    dt_fs: float = 2.0,
    temperature: float = 300.0,
    gamma_ps: float = 1.0,
    cutoff: float = 9.0,
    switch_dist: float = 7.5,
    rfa: bool = True,
    solvent_dielectric: float = units.SOLVENT_DIELECTRIC,
    include_ub=None,  # None -> auto: on iff ff carries UB springs
    bias=None,
    constraints=None,  # a constraints.Constraints -> SHAKE/RATTLE in-kernel
    shake_iters: int = 6,
    rattle_iters: int = 3,
    gb: bool = False,  # in-kernel GB-OBC II implicit solvent (NAMD GBIS)
    ion_concentration: float = 0.0,
    sasa: bool = False,  # in-kernel LCPO SASA nonpolar term (NAMD sasa on)
    surface_tension: float = 0.005,
    sasa_every: int = 1,  # slow-force cadence: LCPO held for k steps (MTS)
    gb_every: int = 1,  # GB slow-force cadence (impulse/Verlet-I r-RESPA)
    block_r: int = 0,  # 0 -> pair-mode default (ring: 64, dense: 8)
    pair_mode: str = "",  # "" -> auto: ring <= 2 lane-tiles, dense above
    interpret: bool = False,
    sasa_pack=None,  # None -> off unless MDX_SASA_PACK=1 (measured wash)
):
    """Build ``advance(pos, vel, forces, t0, seed) -> (pos, vel, frc)``.

    Advances every replica ``n_inner`` BAOAB Langevin steps in one Pallas
    launch. ``bias`` (a HarmonicSMDBias or None) contributes its analytic
    force with the moving-center schedule evaluated at ``t0 + i``.
    ``constraints`` enables in-kernel SHAKE/RATTLE (rigid-bond protocol);
    X-H star clusters converge geometrically (Jacobi contraction ratio
    ~w_heavy/(w_heavy+w_H) ≈ 0.08), so the default sweep counts sit at the
    f32 noise floor (violations ~3e-7 A, measured 10-step rollout).
    ``gb=True`` adds the GB-OBC II polar solvation force (the physics of
    NAMD's ``gbis on``, gendirs_GBIS.py:55-63, matching
    ``solvent.gb_energy``) as three extra ring passes per force call:
    Born radii (HCT descreening + OBC rescaling), the Still pair force with
    per-atom dE/dR accumulation, and the descreening chain-rule pass.
    Requires ``ff`` with GB tables attached; ``solvent_dielectric`` and
    ``ion_concentration`` feed the Debye-screened prefactor.
    ``sasa=True`` adds the LCPO nonpolar force (NAMD ``sasa on``,
    gendirs_GBIS.py:64, matching ``solvent.sasa_energy``) as a dense
    pairwise pass over the *compact heavy-atom set* (hydrogens have zero
    LCPO radius and cannot contribute — see ``_sasa_tables``): buried
    areas + the analytic W-matrix cotangent (dE/dA_pairwise) built from
    per-replica MXU matmuls — with gb it completes the full NAMD campaign
    physics in-kernel. The dense pass runs in replica sub-chunks so its
    (CH, lc, lc) tensors stay VMEM-small at any ``block_r``.

    ``sasa_every=k > 1`` multiple-timesteps the nonpolar term — the
    r-RESPA/held-force cadence NAMD itself uses for slow forces
    (``fullElectFrequency``): the LCPO force is evaluated once per
    k-step block at the block-entry positions (exactly where the carried
    force was last evaluated) and held constant across the block's force
    evaluations. The surface term is the smoothest, smallest force in the
    campaign (surface tension 0.005 kcal/mol/A^2), so the O(k*dt) hold
    error sits far below the Langevin thermostat noise — pinned by the
    ensemble-statistics and NVE-drift tests in tests/test_fused_campaign.
    Requires ``n_inner % sasa_every == 0``. The program still contains
    exactly one instance of the dense pass and one of the fast-force
    body (nested fori_loops, no lax.cond), so compile cost is unchanged.

    ``gb_every=k > 1`` multiple-timesteps the ENTIRE GB polar force with
    the impulse (Verlet-I/r-RESPA) splitting: the slow force (Still pair
    + Born self + descreening chain, isolated as fused-minus-plain ring
    sweeps plus the chain pass) is evaluated once per k-step block and
    enters as half-block velocity kicks at the block boundaries; the
    per-step force evaluation inside the block is the plain pair loop.
    The impulse form is the symplectic-correct one — two naive schedules
    are measured rejects on the NVE trace (held radii: +0.47 kcal/mol
    per 50 steps at k=2; held whole-GB force: -1.5 per 50 steps), while
    the impulse form holds +-0.02 at k=2 and a bounded ~0.5 wobble at
    k=5 (tests/test_fused_gb.py::TestGBMultipleTimestepping). When
    combined with ``sasa_every > 1`` the cadences must be equal and the
    LCPO force rides the same impulse. Requires ``n_inner % gb_every ==
    0``; rigid-bond runs RATTLE-project the impulse kicks.
    Arrays are (R, N, 3); t0 int32 scalar; seed int32 scalar.
    """
    n = ff.n_atoms
    n_pad = ((n + LANE - 1) // LANE) * LANE
    n_shifts = n_pad // 2
    if not pair_mode:
        # ring everywhere: with the 96 MB scoped-VMEM budget the ring
        # kernel holds its lead at every measured size (416 atoms: 260k
        # agg steps/s ring vs 82k composed; docs/VALIDATION.md system-size
        # table). The dense mode is an explicit experimental tier — its
        # (BR, N, N) slabs fail the Mosaic compile past ~2 lane-tiles
        # (measured: remote tpu_compile_helper death at 416 atoms), so it
        # is never auto-selected.
        pair_mode = "ring"
    if pair_mode not in ("ring", "dense"):
        raise ValueError(f"pair_mode must be ring|dense, got {pair_mode!r}")
    use_dense_pairs = pair_mode == "dense"
    if use_dense_pairs and (gb or sasa):
        raise NotImplementedError(
            "the dense mid-size pair tier does not carry the in-kernel "
            "GB/SASA passes (ring layout); use pair_mode='ring' or the "
            "composed XLA path for implicit solvent at this size"
        )
    if not block_r:
        block_r = 8 if use_dense_pairs else 64
    if cutoff is None:
        cutoff = 1e15  # effectively no cutoff (matches the sibling pair ops)
        rfa = False
    if rfa:
        denom = 2.0 * solvent_dielectric + 1.0
        krf = (solvent_dielectric - 1.0) / (denom * cutoff**3)
        crf = 3.0 * solvent_dielectric / (denom * cutoff)
    else:
        krf, crf = 0.0, 0.0

    # --- pair tables (shared builders: physics lives once) ---
    if use_dense_pairs:
        from molecular_dynamics_tpu.ops.nonbonded import _build_pair_tables

        ring_tables = _build_pair_tables(ff, include_ub, n_pad)
    else:
        ring_tables = build_ring_tables(ff, n_pad, include_ub=include_ub)

    ang = _angle_tables(ff, n_pad)
    tor = _torsion_tables(ff, n_pad)
    if ang is None or tor is None:
        raise NotImplementedError(
            "the fused campaign kernel requires angle and torsion terms; "
            "use the composed path (fused_nonbonded) for systems without them"
        )
    max_t = tor[9]

    # --- lane vectors: masses, atom mask, BAOAB constants, bias weights ---
    dt = dt_fs / units.TIMEFACTOR
    gamma = gamma_ps * (units.TIMEFACTOR / 1000.0)
    c1 = float(np.exp(-gamma * dt))
    masses = np.ones(n_pad, np.float32)
    masses[:n] = np.asarray(ff.masses, np.float32)
    amask = np.zeros((1, n_pad), np.float32)
    amask[0, :n] = 1.0
    minv = (amask / masses[None, :]).astype(np.float32)  # ghosts: 0
    c2 = (
        np.sqrt(units.BOLTZMANN * temperature / masses * (1.0 - c1 * c1))[
            None, :
        ]
        * amask
    ).astype(np.float32)

    if bias is not None:
        w1 = np.zeros((1, n_pad), np.float32)
        w2 = np.zeros((1, n_pad), np.float32)
        w1[0, :n] = np.asarray(bias.group1_w, np.float32)
        w2[0, :n] = np.asarray(bias.group2_w, np.float32)
        bias_fk = float(bias.fk)
        bias_c0 = float(bias.cent_0)
        bias_slope = float((bias.cent_1 - bias.cent_0) / bias.T)
        bias_tmax = float(bias.T)
    else:
        w1 = np.zeros((1, n_pad), np.float32)
        w2 = np.zeros((1, n_pad), np.float32)
        bias_fk = 0.0
        bias_c0 = 0.0
        bias_slope = 0.0
        bias_tmax = 0.0

    lane_tables = (
        jnp.asarray(minv), jnp.asarray(c2), jnp.asarray(amask),
        jnp.asarray(w1), jnp.asarray(w2),
    )

    use_cons = constraints is not None and int(constraints.pairs.shape[0]) > 0
    if use_cons:
        cons_tables, c_pad = _constraint_tables(constraints, n_pad)
    else:
        cons_tables, c_pad = (), 0

    use_gb = bool(gb)
    if use_gb:
        if not ff.has_gb:
            raise ValueError(
                "gb=True needs GB tables on the FFParams "
                "(solvent.attach_gb_params)"
            )
        from molecular_dynamics_tpu.solvent import (
            KAPPA_FACTOR,
            OBC_ALPHA,
            OBC_BETA,
            OBC_GAMMA,
        )

        gb_shift_tables, gb_lane_tables = _gb_tables(ff, n_pad)
        inv_eps_s = float(1.0 / solvent_dielectric)
        # Debye kappa at the gb_energy default reference temperature (300 K)
        gb_kappa = (
            float(
                KAPPA_FACTOR
                * (ion_concentration / (solvent_dielectric * 300.0)) ** 0.5
            )
            if ion_concentration > 0.0
            else 0.0
        )
        obc_a, obc_b, obc_g = (
            float(OBC_ALPHA), float(OBC_BETA), float(OBC_GAMMA),
        )
    else:
        gb_shift_tables, gb_lane_tables = (), ()

    use_sasa = bool(sasa)
    #: replica rows per dense-SASA evaluation. Inlining the chunk body
    #: more than once makes Mosaic's scheduler pathological (block_r=32
    #: compiled >30 min on v5e at full width), so larger blocks loop over
    #: sub-chunks with a fori_loop + VMEM scratch (one body instance).
    #: On the compact heavy-atom set (lc ~ 64 lanes) a 16-row chunk keeps
    #: the dense temporaries at half the old (8, 128, 128) footprint.
    sasa_chunk_r = 8
    if use_sasa:
        if not ff.has_gb:
            raise ValueError(
                "sasa=True needs LCPO tables on the FFParams "
                "(solvent.attach_gb_params)"
            )
        sasa_tables, sasa_lc = _sasa_tables(ff, n_pad)
        # two-replica lane packing: when the compact set fits in half the
        # lanes, a dense slab at width lc leaves >=50% of every vreg (and
        # 3/4 of each MXU tile) idle. Packing replica pair (i, i+pw) side
        # by side on the lane axis runs the whole dense pass on full
        # 128-lane vregs / 128-wide contractions; a block-diagonal mask on
        # the overlap test keeps the two replicas from ever interacting
        # (all contractions then stay block-diagonal automatically,
        # because every cross-block lhs/rhs factor is zero). Interpret
        # mode (the CPU test env) defaults to unpacked — the wider slabs
        # only pay off on real vregs/MXU tiles.
        # measured on v5e: packing is a wash (734-741k vs 774k unpacked at
        # 1024 reps) — doubled lane occupancy is cancelled by the wasted
        # cross-replica blocks, and the pass is VPU-schedule-bound either
        # way. Default OFF; opt in via sasa_pack=True or MDX_SASA_PACK=1.
        if sasa_pack is None:
            sasa_pack = os.environ.get("MDX_SASA_PACK", "") == "1"
        sasa_pack = bool(sasa_pack) and sasa_lc <= LANE // 2
        if block_r % 8:
            # the sub-chunk loop slices the scratch in >= 8-sublane rows
            # (Mosaic minimum) and every chunk choice divides powers of
            # two — a non-multiple-of-8 block would either have no valid
            # chunk (StopIteration) or leave scratch rows unwritten
            raise ValueError(
                f"sasa=True requires block_r to be a multiple of 8, got "
                f"{block_r}"
            )
        if sasa_pack:
            sasa_tables, sasa_lc = _sasa_tables(ff, n_pad, pack=2)
            # pw (= block_r/2 packed rows) must be a multiple of 8 so the
            # sub-chunk loop always has a dividing chunk and the scratch
            # keeps >= 8 sublanes
            block_r = ((max(block_r, 16) + 15) // 16) * 16
            pw = block_r // 2
            # chunk = packed rows per dense slab (each row = 2 replicas)
            want = int(os.environ.get("MDX_SASA_CHUNK", 0))
            if want <= 0:
                want = next(c for c in (32, 16, 8) if pw % c == 0)
            sasa_chunk_r = want
            if pw % sasa_chunk_r:
                sasa_chunk_r = 8
        else:
            if sasa_lc <= LANE // 2:
                # largest chunk that divides the block wins on chip (fewer
                # loop iterations, better VPU occupancy): 64 > 16 > 8
                # measured 774k > 750k > 712k agg steps/s on v5e, block 64
                want = int(os.environ.get("MDX_SASA_CHUNK", 0))
                if want <= 0:
                    want = next(
                        c for c in (64, 32, 16, 8)
                        if max(block_r, 8) % c == 0
                    )
                sasa_chunk_r = want
            block_r = max(block_r, sasa_chunk_r)
            if block_r % sasa_chunk_r:
                sasa_chunk_r = 8
        gamma_sasa = float(surface_tension)
    else:
        sasa_tables, sasa_lc, sasa_pack = (), 0, False
    sasa_w = sasa_lc * (2 if sasa_pack else 1)
    sasa_every = int(sasa_every) if use_sasa else 1
    if sasa_every < 1:
        raise ValueError(f"sasa_every must be >= 1, got {sasa_every}")
    if sasa_every > 1 and n_inner % sasa_every:
        raise ValueError(
            f"sasa_every={sasa_every} must divide n_inner={n_inner} "
            "(the held-force blocks tile the launch exactly)"
        )
    gb_every = int(gb_every) if gb else 1
    if gb_every < 1:
        raise ValueError(f"gb_every must be >= 1, got {gb_every}")
    if gb_every > 1:
        if n_inner % gb_every:
            raise ValueError(
                f"gb_every={gb_every} must divide n_inner={n_inner} "
                "(the held-radii blocks tile the launch exactly)"
            )
        if _GB_ABLATE:
            raise ValueError(
                "MDX_GB_ABLATE debug knobs require gb_every=1"
            )
        if use_sasa and sasa_every > 1 and sasa_every != gb_every:
            raise ValueError(
                f"combined cadences must align: sasa_every={sasa_every} "
                f"!= gb_every={gb_every} (one shared block structure)"
            )

    ring_kw = dict(
        cutoff2=float(cutoff) ** 2,
        krf=float(krf),
        crf=float(crf),
        switch_dist=float(switch_dist if switch_dist is not None else 1e15),
        inv_switch_span=float(
            1.0 / (cutoff - switch_dist) if switch_dist is not None else 0.0
        ),
    )
    if use_dense_pairs:
        from molecular_dynamics_tpu.ops.nonbonded import dense_pair_forces

        def pair_forces(x, y, z, tabs, **kw):
            return dense_pair_forces(x, y, z, tabs, **kw)
    else:
        ring_kw["n_shifts"] = n_shifts
        pair_forces = ring_pair_forces

    def kernel(
        t0_ref, seed_ref,  # SMEM (1,1) int32
        x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref,
        fx_ref, fy_ref, fz_ref,
        qq_ref, a_ref, b_ref, m_ref, kb_ref, d0_ref, a14_ref, b14_ref,
        qq14_ref,
        # angle tables
        ad21_ref, ad23_ref, ad21t_ref, ad23t_ref, ak_ref, at0_ref,
        # torsion tables
        td12_ref, td23_ref, td34_ref, td12t_ref, td23t_ref, td34t_ref,
        tk_ref, tphi0_ref, tper_ref,
        minv_ref, c2_ref, amask_ref, w1_ref, w2_ref,
        *rest,
    ):
        if use_cons:
            ccd_ref, ccs_ref, cwsum_ref, cwinv_ref, cd0_ref = rest[:5]
            rest = rest[5:]
        if use_gb:
            (
                gqq_ref, ggm_ref, gsp_ref, grp_ref, grpi_ref,
                grho_ref, grhoi_ref, gsrow_ref, gradi_ref, gqs_ref,
            ) = rest[:10]
            rest = rest[10:]
        if use_sasa:
            (
                ssel_ref, sselt_ref,
                sradc_ref, sradr_ref, sa0_ref, sp2_ref, sp3_ref, sp4_ref,
            ) = rest[:8]
            rest = rest[8:]
        (
            ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref,
            ofx_ref, ofy_ref, ofz_ref,
        ) = rest[:9]
        scratch = rest[9:]
        if use_gb:
            # per-shift HCT-derivative cache filled by the Born pass and
            # consumed by the (now multiply-accumulate-only) chain pass
            if _GB_CHAIN_PROD:
                (
                    gdfx_ref, gdfy_ref, gdfz_ref,
                    gdrx_ref, gdry_ref, gdrz_ref,
                ) = scratch[:6]
                scratch = scratch[6:]
            else:
                gdf_ref, gdr_ref = scratch[:2]
                scratch = scratch[2:]
        if use_sasa:
            # VMEM scratch for the 8-row sub-chunk loop of the dense pass
            (
                ssx_ref, ssy_ref, ssz_ref, sfx_ref, sfy_ref, sfz_ref,
            ) = scratch[:6]
        # interpret mode (CPU test env) has no lowering for the on-core TPU
        # PRNG primitives — draw thermostat noise from the stateless
        # counter-based host PRNG instead (same N(0,1) distribution; the
        # noisy path is distribution-tested, not bit-pinned)
        host_rng = interpret and temperature > 0.0
        if temperature > 0.0 and not host_rng:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        if host_rng:
            base_key = jax.random.PRNGKey(
                seed_ref[0, 0] + pl.program_id(0)
            )
        pair_tabs = tuple(
            r[:] for r in (qq_ref, a_ref, b_ref, m_ref, kb_ref, d0_ref,
                           a14_ref, b14_ref, qq14_ref)
        )
        ad21 = ad21_ref[:]
        ad23 = ad23_ref[:]
        ad21t = ad21t_ref[:]
        ad23t = ad23t_ref[:]
        ak = ak_ref[:]
        at0 = at0_ref[:]
        td12 = td12_ref[:]
        td23 = td23_ref[:]
        td34 = td34_ref[:]
        td12t = td12t_ref[:]
        td23t = td23t_ref[:]
        td34t = td34t_ref[:]
        tk = tk_ref[:]
        tphi0 = tphi0_ref[:]
        tper = tper_ref[:]
        minv = minv_ref[:]
        c2v = c2_ref[:]
        amask = amask_ref[:]
        w1v = w1_ref[:]
        w2v = w2_ref[:]
        wdiff = w2v - w1v
        t0 = t0_ref[0, 0].astype(jnp.float32)

        if use_cons:
            ccd = ccd_ref[:]
            ccs = ccs_ref[:]
            cwsum = cwsum_ref[:]
            cwinv = cwinv_ref[:]
            cd0sq = cd0_ref[:]

            def cgather(ax, ay, az):
                # one stacked matmul extracts all three coordinate diffs
                g = _mm(jnp.concatenate([ax, ay, az], axis=0), ccd)
                b = ax.shape[0]
                return g[:b], g[b : 2 * b], g[2 * b :]

            def cscatter(px, py, pz, gx, gy, gz):
                u = _mm(jnp.concatenate([gx, gy, gz], axis=0), ccs)
                b = px.shape[0]
                return px + u[:b], py + u[b : 2 * b], pz + u[2 * b :]

            def shake(x, y, z, rx, ry, rz):
                # SHAKE along reference bond directions
                # (constraints.py:112-119)
                def sweep(_, carry):
                    x, y, z = carry
                    dx, dy, dz = cgather(x, y, z)
                    diff = dx * dx + dy * dy + dz * dz - cd0sq
                    denom = 2.0 * cwsum * (dx * rx + dy * ry + dz * rz)
                    g = diff / jnp.where(
                        jnp.abs(denom) > 1e-12, denom, 1e-12
                    )
                    return cscatter(x, y, z, g * rx, g * ry, g * rz)

                return jax.lax.fori_loop(0, shake_iters, sweep, (x, y, z))

            def rattle(vx, vy, vz, x, y, z):
                # RATTLE: zero along-bond relative velocity
                # (constraints.py:134-146)
                dx, dy, dz = cgather(x, y, z)
                inv = jax.lax.rsqrt(
                    jnp.maximum(dx * dx + dy * dy + dz * dz, _EPS)
                )
                hx, hy, hz = dx * inv, dy * inv, dz * inv

                def sweep(_, carry):
                    vx, vy, vz = carry
                    rx, ry, rz = cgather(vx, vy, vz)
                    lam = (rx * hx + ry * hy + rz * hz) * cwinv
                    return cscatter(vx, vy, vz, lam * hx, lam * hy, lam * hz)

                return jax.lax.fori_loop(
                    0, rattle_iters, sweep, (vx, vy, vz)
                )

        if use_gb:
            grho = grho_ref[:]
            grhoi = grhoi_ref[:]
            gsrow = gsrow_ref[:]
            gradi = gradi_ref[:]
            gqs = gqs_ref[:]
            gqq_full = gqq_ref[:]  # static rows for the merged pair loop
            one = jnp.int32(1)
            ring_start = jnp.int32(n_pad - n_shifts)

            # The GB passes loop over shifts with lax.fori_loop + dynamic
            # table-row loads (NOT the static unroll the main pair loop
            # uses): three extra unrolled 64-shift passes per step made the
            # jaxpr/Mosaic program explode (>10x compile time).
            def _grow(ref, i):
                return ref[pl.ds(n_shifts - 1 - i, 1), :]

            def born_pass(x, y, z):
                # HCT descreening sums -> psi -> OBC II Born radii + dR/dpsi.
                # The exact dI/dd of both integral directions is computed
                # here too (it depends only on geometry + static tables, not
                # on the Born radii) and cached per shift as mrow*dI*rinv —
                # the chain pass then reduces to a multiply-accumulate
                # sweep instead of re-deriving the HCT math.
                br = x.shape[0]

                def body(i, carry):
                    xs, ys, zs, sum_i, rev = carry
                    mrow = _grow(ggm_ref, i)
                    s_j = _grow(gsp_ref, i)
                    rho_j = _grow(grp_ref, i)
                    rhoi_j = _grow(grpi_ref, i)
                    dx = x - xs
                    dy = y - ys
                    dz = z - zs
                    d2 = dx * dx + dy * dy + dz * dz
                    live = mrow > 0.0
                    d2s = jnp.where(live, d2, 1.0)
                    dinv = jax.lax.rsqrt(d2s)
                    d = d2s * dinv
                    i_f, di_f, i_r, di_r = _hct_pair_both(
                        d, dinv, grho, grhoi, gsrow,
                        rho_j, rhoi_j, s_j, live, True,
                    )
                    row = pl.ds(pl.multiple_of(i * br, br), br)
                    mr = mrow * dinv
                    if _GB_CHAIN_PROD:
                        uf = mr * di_f
                        ur = mr * di_r
                        gdfx_ref[row, :] = uf * dx
                        gdfy_ref[row, :] = uf * dy
                        gdfz_ref[row, :] = uf * dz
                        gdrx_ref[row, :] = ur * dx
                        gdry_ref[row, :] = ur * dy
                        gdrz_ref[row, :] = ur * dz
                    else:
                        gdf_ref[row, :] = mr * di_f
                        gdr_ref[row, :] = mr * di_r
                    sum_i = sum_i + mrow * i_f
                    rev = pltpu.roll(rev, one, 1) + mrow * i_r
                    return (
                        pltpu.roll(xs, one, 1),
                        pltpu.roll(ys, one, 1),
                        pltpu.roll(zs, one, 1),
                        sum_i,
                        rev,
                    )

                z0 = jnp.zeros_like(x)
                if interpret or not _GB_STATIC_BORN:
                    _, _, _, sum_i, rev = jax.lax.fori_loop(
                        0,
                        n_shifts,
                        body,
                        (
                            pltpu.roll(x, ring_start, 1),
                            pltpu.roll(y, ring_start, 1),
                            pltpu.roll(z, ring_start, 1),
                            z0,
                            z0,
                        ),
                        unroll=_GB_UNROLL,
                    )
                else:
                    # static unroll for Mosaic (same win as the chain pass:
                    # no carried-state copies, no dynamic row loads); the
                    # HCT body is heavy, so this stays behind a knob that
                    # interpret mode (CPU tests) never takes
                    carry = (
                        pltpu.roll(x, ring_start, 1),
                        pltpu.roll(y, ring_start, 1),
                        pltpu.roll(z, ring_start, 1),
                        z0,
                        z0,
                    )
                    for i in range(n_shifts):
                        carry = body(i, carry)
                    _, _, _, sum_i, rev = carry
                sum_i = sum_i + pltpu.roll(rev, one, 1)
                psi = 0.5 * grho * sum_i
                h = psi * (obc_a + psi * (-obc_b + obc_g * psi))
                th = jnp.tanh(h)
                born_inv = grhoi - th * gradi
                born = 1.0 / born_inv
                hp = obc_a + psi * (-2.0 * obc_b + 3.0 * obc_g * psi)
                d_born_dpsi = born * born * (1.0 - th * th) * hp * gradi
                # born_inv rides along for free (pre-reciprocal OBC form):
                # the Still term turns its three divisions into multiplies
                return born, born_inv, d_born_dpsi

            def _gb_uprime(f, finv):
                # d/df of u(f) = (1 - exp(-kappa f)/eps_s)/f  [x ELEC via qq]
                if gb_kappa > 0.0:
                    es = inv_eps_s * jnp.exp(-gb_kappa * f)
                    return (es * (1.0 + gb_kappa * f) - 1.0) * finv * finv
                return (inv_eps_s - 1.0) * finv * finv

            def gb_chain_pass(x, y, z, ce):
                # dE/dR * dR/dpsi * dpsi/dd distributed over pairs: pure
                # multiply-accumulate against the born pass's cached
                # mrow*dI*rinv rows (the expensive HCT math ran once).
                br = x.shape[0]

                def shift_term(u_f, u_r, xs, ys, zs, ces):
                    dx = x - xs
                    dy = y - ys
                    dz = z - zs
                    coeff = ce * u_f + ces * u_r
                    return coeff * dx, coeff * dy, coeff * dz

                def prod_term(row, ces):
                    # cached dI·dx products: no coordinate recompute, no
                    # gather-side coordinate rolls — only the partner
                    # cotangent ``ces`` advances around the ring
                    return (
                        ce * gdfx_ref[row, :] + ces * gdrx_ref[row, :],
                        ce * gdfy_ref[row, :] + ces * gdry_ref[row, :],
                        ce * gdfz_ref[row, :] + ces * gdrz_ref[row, :],
                    )

                z0 = jnp.zeros_like(x)
                # dispatch: ilv2 always takes its static branch (interpret
                # included — it is the only lowering of that layout); the
                # interpret fori branches keep CPU-test compiles fast for
                # the other layouts
                if interpret and not _GB_CHAIN_ILV and _GB_CHAIN_PROD:
                    def body(i, carry):
                        ces, fx, fy, fz, ax, ay, az = carry
                        row = pl.ds(pl.multiple_of(i * br, br), br)
                        cx, cy, cz = prod_term(row, ces)
                        return (
                            pltpu.roll(ces, one, 1),
                            fx - cx, fy - cy, fz - cz,
                            pltpu.roll(ax, one, 1) + cx,
                            pltpu.roll(ay, one, 1) + cy,
                            pltpu.roll(az, one, 1) + cz,
                        )

                    (_, fx, fy, fz, ax, ay, az) = jax.lax.fori_loop(
                        0, n_shifts, body,
                        (
                            pltpu.roll(ce, ring_start, 1),
                            z0, z0, z0, z0, z0, z0,
                        ),
                        unroll=_GB_UNROLL,
                    )
                elif interpret and not _GB_CHAIN_ILV:
                    # fori_loop + dynamic row loads: one traced body keeps
                    # interpret-mode (CPU test) compiles fast
                    def body(i, carry):
                        xs, ys, zs, ces, fx, fy, fz, ax, ay, az = carry
                        row = pl.ds(pl.multiple_of(i * br, br), br)
                        cx, cy, cz = shift_term(
                            gdf_ref[row, :], gdr_ref[row, :],
                            xs, ys, zs, ces,
                        )
                        return (
                            pltpu.roll(xs, one, 1),
                            pltpu.roll(ys, one, 1),
                            pltpu.roll(zs, one, 1),
                            pltpu.roll(ces, one, 1),
                            fx - cx, fy - cy, fz - cz,
                            pltpu.roll(ax, one, 1) + cx,
                            pltpu.roll(ay, one, 1) + cy,
                            pltpu.roll(az, one, 1) + cz,
                        )

                    (_, _, _, _, fx, fy, fz, ax, ay, az) = jax.lax.fori_loop(
                        0, n_shifts, body,
                        (
                            pltpu.roll(x, ring_start, 1),
                            pltpu.roll(y, ring_start, 1),
                            pltpu.roll(z, ring_start, 1),
                            pltpu.roll(ce, ring_start, 1),
                            z0, z0, z0, z0, z0, z0,
                        ),
                        unroll=_GB_UNROLL,
                    )
                elif _GB_CHAIN_ILV:
                    # static unroll, two interleaved streams: stream s
                    # handles shifts i ≡ s (mod 2), every carried variable
                    # (gather coords, partner cotangent, scatter
                    # accumulators) advances by TWO lanes every other
                    # iteration — same total shuffle work, half the
                    # serial dependency depth per chain
                    two = jnp.int32(2)
                    st = [
                        dict(
                            xs=pltpu.roll(x, ring_start + s, 1),
                            ys=pltpu.roll(y, ring_start + s, 1),
                            zs=pltpu.roll(z, ring_start + s, 1),
                            ces=pltpu.roll(ce, ring_start + s, 1),
                            fx=z0, fy=z0, fz=z0, ax=z0, ay=z0, az=z0,
                        )
                        for s in range(2)
                    ]
                    first = [True, True]
                    for i in range(n_shifts):
                        s = st[i % 2]
                        if not first[i % 2]:
                            s["xs"] = pltpu.roll(s["xs"], two, 1)
                            s["ys"] = pltpu.roll(s["ys"], two, 1)
                            s["zs"] = pltpu.roll(s["zs"], two, 1)
                            s["ces"] = pltpu.roll(s["ces"], two, 1)
                        first[i % 2] = False
                        cx, cy, cz = shift_term(
                            gdf_ref[i * br : (i + 1) * br, :],
                            gdr_ref[i * br : (i + 1) * br, :],
                            s["xs"], s["ys"], s["zs"], s["ces"],
                        )
                        s["fx"] = s["fx"] - cx
                        s["fy"] = s["fy"] - cy
                        s["fz"] = s["fz"] - cz
                        s["ax"] = pltpu.roll(s["ax"], two, 1) + cx
                        s["ay"] = pltpu.roll(s["ay"], two, 1) + cy
                        s["az"] = pltpu.roll(s["az"], two, 1) + cz
                    # each cx_i needs a total scatter roll of n_shifts - i
                    # lanes. Stream 0 (even i, 0-based): in-loop rolls gave
                    # n_shifts - 2 - i, finish with 2; stream 1 (odd i):
                    # gave n_shifts - 1 - i, finish with 1. Fold fully here
                    # and hand zeros to the shared roll(a*, 1) fold below.
                    fx = (
                        st[0]["fx"] + st[1]["fx"]
                        + pltpu.roll(st[0]["ax"], two, 1)
                        + pltpu.roll(st[1]["ax"], one, 1)
                    )
                    fy = (
                        st[0]["fy"] + st[1]["fy"]
                        + pltpu.roll(st[0]["ay"], two, 1)
                        + pltpu.roll(st[1]["ay"], one, 1)
                    )
                    fz = (
                        st[0]["fz"] + st[1]["fz"]
                        + pltpu.roll(st[0]["az"], two, 1)
                        + pltpu.roll(st[1]["az"], one, 1)
                    )
                    ax, ay, az = z0, z0, z0
                elif _GB_CHAIN_PROD:
                    # static unroll, cached-products layout: 4 rolls per
                    # shift instead of 7
                    ces = pltpu.roll(ce, ring_start, 1)
                    fx, fy, fz = z0, z0, z0
                    ax, ay, az = z0, z0, z0
                    for i in range(n_shifts):
                        cx, cy, cz = prod_term(
                            slice(i * br, (i + 1) * br), ces
                        )
                        fx = fx - cx
                        fy = fy - cy
                        fz = fz - cz
                        ax = pltpu.roll(ax, one, 1) + cx
                        ay = pltpu.roll(ay, one, 1) + cy
                        az = pltpu.roll(az, one, 1) + cz
                        if i < n_shifts - 1:
                            ces = pltpu.roll(ces, one, 1)
                else:
                    # static full unroll for Mosaic: the body is ~15 vector
                    # ops, so 64 shifts are cheap to compile and drop the
                    # fori_loop's carried-state copies and dynamic row
                    # loads (GBIS 0.81 -> 1.03 M agg steps/s)
                    xs = pltpu.roll(x, ring_start, 1)
                    ys = pltpu.roll(y, ring_start, 1)
                    zs = pltpu.roll(z, ring_start, 1)
                    ces = pltpu.roll(ce, ring_start, 1)
                    fx, fy, fz = z0, z0, z0
                    ax, ay, az = z0, z0, z0
                    for i in range(n_shifts):
                        cx, cy, cz = shift_term(
                            gdf_ref[i * br : (i + 1) * br, :],
                            gdr_ref[i * br : (i + 1) * br, :],
                            xs, ys, zs, ces,
                        )
                        fx = fx - cx
                        fy = fy - cy
                        fz = fz - cz
                        ax = pltpu.roll(ax, one, 1) + cx
                        ay = pltpu.roll(ay, one, 1) + cy
                        az = pltpu.roll(az, one, 1) + cz
                        if i < n_shifts - 1:
                            xs = pltpu.roll(xs, one, 1)
                            ys = pltpu.roll(ys, one, 1)
                            zs = pltpu.roll(zs, one, 1)
                            ces = pltpu.roll(ces, one, 1)
                fx = fx + pltpu.roll(ax, one, 1)
                fy = fy + pltpu.roll(ay, one, 1)
                fz = fz + pltpu.roll(az, one, 1)
                return fx, fy, fz

        if use_sasa:
            ssel = ssel_ref[:]  # (L, lc) 0/1 gather to the heavy-atom set
            sselt = sselt_ref[:]  # (lc, L) scatter back
            sradc = sradc_ref[:]  # (lc, 1): radius of atom p (sublane index)
            sradr = sradr_ref[:]  # (1, lc): radius of atom q (lane index)
            sa0 = sa0_ref[:]
            sp2 = sp2_ref[:]
            sp3 = sp3_ref[:]
            sp4 = sp4_ref[:]
            two_pi = 2.0 * _PI
            if sasa_pack:
                # block-diagonal replica mask for the two-replica lane
                # packing: lanes [0, lc) hold replica i, [lc, 2lc) hold
                # replica i+pw — pairs must stay within their own half
                bp = jax.lax.broadcasted_iota(jnp.int32, (sasa_w, sasa_w), 0)
                bq = jax.lax.broadcasted_iota(jnp.int32, (sasa_w, sasa_w), 1)
                blk_mask = (bp < sasa_lc) == (bq < sasa_lc)
            # hoisted per-pair constants (trace-time, outside the n_inner
            # fori body — the chunk chain is VPU-bound, so every folded
            # broadcast op counts): overlap window [|rp-rq|, rp+rq] and
            # the buried-area factors  a = o*(k1 - k2*d - k3/d),
            # da/dd = -k2 + k3/d^2  (Weiser eq. 3 regrouped by powers of d)
            s_rsum = sradc + sradr  # (W, W)
            s_rdiff = jnp.abs(sradc - sradr)
            s_k1 = two_pi * sradc * sradc  # (W, 1)
            s_k2 = _PI * sradc  # (W, 1): 2*pi*rp * 0.5
            s_k3 = _PI * sradc * (
                sradc * sradc - sradr * sradr
            )  # (W, W): 2*pi*rp * 0.5*(rp^2 - rq^2)

            #: MXU precision for the dense-pass contractions. HIGHEST
            #: (6-pass f32) is the parity-pinned default; MDX_SASA_PREC=
            #: default (single-pass bf16) is a measurement knob for the
            #: matmul-pass ceiling (Mosaic cannot lower Precision.HIGH).
            _sasa_prec = {
                "highest": jax.lax.Precision.HIGHEST,
                "default": jax.lax.Precision.DEFAULT,
            }[os.environ.get("MDX_SASA_PREC", "highest")]

            # NOTE: a flat (CH, W*W) layout for the elementwise geometry
            # chain (full 128-lane vreg occupancy vs 44% at W ~ 56) was
            # attempted and is IMPOSSIBLE on Mosaic: lane-crossing
            # reshapes — vector<56x56xf32> -> vector<1x3136xf32> — fail
            # with "infer-vector-layout: unsupported shape cast"; only
            # sublane-merging reshapes (lanes unchanged) lower. Lane
            # occupancy can't be recovered by relayout; concat-based
            # packing (two replicas per lane row) was separately measured
            # and rejected (VALIDATION.md). Math was parity-verified in
            # interpret mode before the lowering attempt.

            def _bmm(a_, b_, contract, precision=None):
                precision = _sasa_prec if precision is None else precision
                # batched per-replica (L, L) matmul; contract = (lhs, rhs)
                # contraction axes (1-based within each (L, L) slice + 1)
                return jax.lax.dot_general(
                    a_, b_, ((contract[0], contract[1]), ((0,), (0,))),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )

            #: perf-ablation knob (debug only, parity tests run with ""):
            #: "null" skips the whole dense pass, "geom" stops after o/a,
            #: "nogate" skips the T3/T4 gate matmuls (g = gamma),
            #: "now" skips the two W contractions (w = g*P2 only)
            _ablate = os.environ.get("MDX_SASA_ABLATE", "")

            def _sasa_chunk(x, y, z):
                # dense (CH, L, L) LCPO: buried areas a_pq (Weiser eq. 3),
                # per-atom areas via batched MXU contractions, then the
                # analytic dE/da_pq cotangent W and its d-derivative.
                # Same math as solvent.sasa_energy; W derivation pinned by
                # tests against jax.grad of the composed path.
                # NOTE: a Gram-matrix d2 (|r_p|^2 + |r_q|^2 - 2 r_p.r_q via
                # the MXU) was measured here and REJECTED: it saves ~4 slab
                # ops (~2% step time) but f32 cancellation at |r| ~ 30 A
                # raises the kernel force error 26x (1.4e-2 vs the 5.4e-4
                # f64-pinned floor, tests/test_fused_gb.py) — exact lane
                # differences are the accuracy-critical form.
                dx = x[:, :, None] - x[:, None, :]
                dy = y[:, :, None] - y[:, None, :]
                dz = z[:, :, None] - z[:, None, :]
                c_rsum, c_rdiff = s_rsum[None], s_rdiff[None]
                c_k1, c_k2, c_k3 = s_k1[None], s_k2[None], s_k3[None]
                c_blk = blk_mask[None] if sasa_pack else None
                d2 = dx * dx + dy * dy + dz * dz
                # zero-distance guard via a huge filler: d becomes 1e6 A on
                # the diagonal / coincident ghosts, which the d < r_p + r_q
                # window test rejects on its own — no third mask term
                d2s = jnp.where(d2 > 0.0, d2, 1e12)
                dinv = jax.lax.rsqrt(d2s)
                d = d2s * dinv
                o_b = (d < c_rsum) & (d > c_rdiff)
                if sasa_pack:
                    o_b = o_b & c_blk
                o = jnp.where(o_b, 1.0, 0.0)
                k3d = c_k3 * dinv  # shared between a and da/dd
                a = o * (
                    c_k1 - c_k2 * d - k3d
                )  # == oa (solvent.py: a_ij pre-masked by overlap)
                # da/dd and the masked per-pair force factor, still on the
                # chain layout; c = W ∘ cfac downstream
                ap = k3d * dinv - c_k2
                cfac = jnp.where(o_b, ap, 0.0) * dinv
                if _ablate == "geom":
                    return a[:, :, 0] * 0.0, a[:, :, 0] * 0.0, \
                        a[:, :, 0] * 0.0
                # B_pk = sum_q o_pq a_kq (o @ oa^T): ONE contraction feeds
                # both the gate sums and the W T4-oa term —
                #   T3_p = sum_q o_pq (o@oa)_pq = sum_k o_pk B_pk
                #   T4_p = sum_q o_pq (oa@oa)_pq = sum_k a_pk B_pk
                # (swap the q/k summation order), so the two dedicated
                # bf16 gate matmuls of the previous formulation vanish
                b_mat = _bmm(o, a, ((2,), (2,)))
                # m34 = P3_p o + P4_p a is shared verbatim between the
                # area gate (below) and the W cotangent (gp34 = g * m34),
                # and folding the P-weights INTO the summand collapses the
                # three per-term lane reductions t2/t3/t4 into one:
                #   A_p = A0_p + sum_q [P2_p a_pq + (m34 ∘ B)_pq]
                # (2 reductions saved on the pass that is reduction-bound
                # per the ablation table in docs/VALIDATION.md)
                m34 = sp3[None] * o + sp4[None] * a
                if _ablate == "nogate":
                    g = jnp.where(sradc[None] > 0.0, gamma_sasa, 0.0)
                else:
                    area = sa0[None] + jnp.sum(
                        sp2[None] * a + m34 * b_mat, axis=2, keepdims=True
                    )
                    g = jnp.where(
                        (area > 0.0) & (sradc[None] > 0.0), gamma_sasa, 0.0
                    )  # (BR, L, 1): gamma gated by relu in sum(max(A, 0))
                # W_pq = dE/da_pq:
                #   g_p P2_p                        (T2 of atom p)
                # + o_pq (o^T diag(gP3) o)_pq       (T3 of every atom i)
                # + g_p P4_p (o @ oa^T)_pq          (T4 of atom p, a-factor)
                # + o_pq (a^T diag(gP4) o)_pq       (T4 of atom i, oa-factor)
                # The T3 and T4-oa terms contract the same rhs (o) over the
                # same axis, so they merge into ONE matmul with
                # lhs = diag(gP3) o + diag(gP4) a.
                if _ablate == "now":
                    w = g * sp2[None]
                else:
                    gp34 = g * m34
                    w = (
                        g * sp2[None]
                        + o * _bmm(gp34, o, ((1,), (1,)))
                        + (g * sp4[None]) * b_mat
                    )
                c = w * cfac
                # forces on the MXU instead of 3 dense multiplies + 6 VPU
                # reductions: with F_j = colsum_j(C dvec) - rowsum_j(C dvec)
                # and dvec_pq = r_p - r_q,
                #   F = (C + C^T) @ r  -  r * ((C + C^T) @ 1)
                # — two batched contractions against a stacked (4, W) rhs
                # [x; y; z; 1] (the ones column picks up the C row/col sums;
                # ghost lanes are inert because their C entries are 0)
                rhs = jnp.stack(
                    [x, y, z, jnp.ones_like(x)], axis=1
                )  # (CH, 4, W)
                bmv = lambda contract: jax.lax.dot_general(
                    rhs, c, (((2,), (contract,)), ((0,), (0,))),
                    precision=_sasa_prec,
                    preferred_element_type=jnp.float32,
                )
                s = bmv(2) + bmv(1)  # (CH, 4, W): (C + C^T) @ [r; 1]
                return (
                    s[:, 0] - x * s[:, 3],
                    s[:, 1] - y * s[:, 3],
                    s[:, 2] - z * s[:, 3],
                )

            def sasa_pass(x, y, z):
                # Gather the heavy-atom set (exact 0/1 selection matmuls),
                # run the dense pass in sub-chunks through VMEM scratch —
                # one (CH, w, w) body instance regardless of block_r
                # (see the sasa_chunk_r note above), dynamic sublane-
                # aligned slices — then scatter the compact forces back to
                # full atom lanes with one matmul per axis. In packed mode
                # replicas [0, pw) ride lanes [0, lc) and replicas
                # [pw, 2pw) ride lanes [lc, 2lc) of the same scratch rows.
                if _ablate == "null":
                    return x * 0.0, y * 0.0, z * 0.0
                if sasa_pack:
                    pw = block_r // 2
                    ssx_ref[:] = jnp.concatenate(
                        [_mm(x[:pw], ssel), _mm(x[pw:], ssel)], axis=1
                    )
                    ssy_ref[:] = jnp.concatenate(
                        [_mm(y[:pw], ssel), _mm(y[pw:], ssel)], axis=1
                    )
                    ssz_ref[:] = jnp.concatenate(
                        [_mm(z[:pw], ssel), _mm(z[pw:], ssel)], axis=1
                    )
                    n_rows = pw
                else:
                    ssx_ref[:] = _mm(x, ssel)
                    ssy_ref[:] = _mm(y, ssel)
                    ssz_ref[:] = _mm(z, ssel)
                    n_rows = block_r

                def body(c, _):
                    r0 = pl.multiple_of(c * sasa_chunk_r, sasa_chunk_r)
                    sl = pl.ds(r0, sasa_chunk_r)
                    cfx, cfy, cfz = _sasa_chunk(
                        ssx_ref[sl, :], ssy_ref[sl, :], ssz_ref[sl, :]
                    )
                    sfx_ref[sl, :] = cfx
                    sfy_ref[sl, :] = cfy
                    sfz_ref[sl, :] = cfz
                    return 0

                jax.lax.fori_loop(
                    0, n_rows // sasa_chunk_r, body, 0, unroll=1
                )
                if sasa_pack:
                    fxp, fyp, fzp = sfx_ref[:], sfy_ref[:], sfz_ref[:]
                    cat = lambda f: jnp.concatenate(
                        [_mm(f[:, :sasa_lc], sselt), _mm(f[:, sasa_lc:], sselt)],
                        axis=0,
                    )
                    return cat(fxp), cat(fyp), cat(fzp)
                return (
                    _mm(sfx_ref[:], sselt),
                    _mm(sfy_ref[:], sselt),
                    _mm(sfz_ref[:], sselt),
                )

        def forces(x, y, z, t_step, fast_only=False):
            if use_gb and fast_only:
                # impulse-MTS inner eval (gb_every > 1): the GB(+SASA)
                # slow force enters as half-block kicks at the block
                # boundaries (Verlet-I/r-RESPA splitting); the per-step
                # force is the plain pair loop only. Two naive schedules
                # were measured rejects on the NVE trace: held RADII
                # (+0.47 kcal/mol per 50 steps at k=2 — frozen radii
                # deform the potential surface) and held whole-GB FORCE
                # (-1.5 per 50 steps at k=2 — the GB force is too large
                # and fast-varying for constant-force extrapolation).
                fx, fy, fz, _ = ring_pair_forces(
                    x, y, z, pair_tabs, **ring_kw
                )
            elif use_gb:
                # Born radii first; the Still pair force then rides the
                # main ring loop's geometry (one sweep instead of two)
                if _GB_ABLATE == "noborn":
                    born = grho + jnp.zeros_like(x)
                    born_inv = 1.0 / born
                    d_born_dpsi = jnp.zeros_like(x)
                else:
                    born, born_inv, d_born_dpsi = born_pass(x, y, z)
                if _GB_ABLATE == "nostill":
                    fx, fy, fz, _ = ring_pair_forces(
                        x, y, z, pair_tabs, **ring_kw
                    )
                    der = jnp.zeros_like(x)
                else:
                    fx, fy, fz, _, der = ring_pair_forces(
                        x, y, z, pair_tabs,
                        gb={
                            "born": born,
                            "born_inv": born_inv,
                            "uprime": _gb_uprime,
                            "qq_t": gqq_full,
                        },
                        **ring_kw,
                    )
                # Born self terms E_ii = -1/2 ke q_i^2 u(R_i)
                der = der - 0.5 * gqs * _gb_uprime(born, born_inv)
                ce = der * d_born_dpsi * (0.5 * grho)
                # "noborn" must skip the chain too: it reads the Born
                # pass's VMEM-cached dI rows (uninitialized otherwise)
                if _GB_ABLATE not in ("nochain", "noborn"):
                    cfx, cfy, cfz = gb_chain_pass(x, y, z, ce)
                    fx = fx + cfx
                    fy = fy + cfy
                    fz = fz + cfz
            else:
                fx, fy, fz, _ = pair_forces(
                    x, y, z, pair_tabs, **ring_kw
                )
            if use_sasa and sasa_every == 1:
                sfx, sfy, sfz = sasa_pass(x, y, z)
                fx = fx + sfx
                fy = fy + sfy
                fz = fz + sfz

            # --- angles: analytic 3-centre forces (forces.py:519-535) ---
            r21x = _mm(x, ad21)
            r21y = _mm(y, ad21)
            r21z = _mm(z, ad21)
            r23x = _mm(x, ad23)
            r23y = _mm(y, ad23)
            r23z = _mm(z, ad23)
            cxp = r21y * r23z - r21z * r23y
            cyp = r21z * r23x - r21x * r23z
            czp = r21x * r23y - r21y * r23x
            nrm = jnp.sqrt(
                jnp.maximum(cxp * cxp + cyp * cyp + czp * czp, _EPS)
            )
            dot = r21x * r23x + r21y * r23y + r21z * r23z
            theta = _atan2(nrm, dot)
            n21i = jax.lax.rsqrt(
                jnp.maximum(r21x**2 + r21y**2 + r21z**2, _EPS)
            )
            n23i = jax.lax.rsqrt(
                jnp.maximum(r23x**2 + r23y**2 + r23z**2, _EPS)
            )
            cos_t = dot * n21i * n23i
            sin_t = jnp.maximum(nrm * n21i * n23i, 1e-6)
            coef = -2.0 * ak * (theta - at0) / sin_t
            f0x = coef * (cos_t * r21x * n21i - r23x * n23i) * n21i
            f0y = coef * (cos_t * r21y * n21i - r23y * n23i) * n21i
            f0z = coef * (cos_t * r21z * n21i - r23z * n23i) * n21i
            f2x = coef * (cos_t * r23x * n23i - r21x * n21i) * n23i
            f2y = coef * (cos_t * r23y * n23i - r21y * n21i) * n23i
            f2z = coef * (cos_t * r23z * n23i - r21z * n21i) * n23i
            fx = fx + _mm(f0x, ad21t) + _mm(f2x, ad23t)
            fy = fy + _mm(f0y, ad21t) + _mm(f2y, ad23t)
            fz = fz + _mm(f0z, ad21t) + _mm(f2z, ad23t)

            # --- torsions: analytic 4-centre forces (forces.py:581-600) ---
            b1x = _mm(x, td12)
            b1y = _mm(y, td12)
            b1z = _mm(z, td12)
            b2x = _mm(x, td23)
            b2y = _mm(y, td23)
            b2z = _mm(z, td23)
            b3x = _mm(x, td34)
            b3y = _mm(y, td34)
            b3z = _mm(z, td34)
            cax = b1y * b2z - b1z * b2y
            cay = b1z * b2x - b1x * b2z
            caz = b1x * b2y - b1y * b2x
            cbx = b2y * b3z - b2z * b3y
            cby = b2z * b3x - b2x * b3z
            cbz = b2x * b3y - b2y * b3x
            mxv = cay * cbz - caz * cby
            myv = caz * cbx - cax * cbz
            mzv = cax * cby - cay * cbx
            b2n = jnp.sqrt(
                jnp.maximum(b2x * b2x + b2y * b2y + b2z * b2z, _EPS)
            )
            sin_num = (b2x * mxv + b2y * myv + b2z * mzv) / b2n
            cos_num = cax * cbx + cay * cby + caz * cbz
            phi = -_atan2(sin_num, cos_num)
            coeff = jnp.zeros_like(phi)
            for t_i in range(max_t):
                k_row = tk[t_i, :][None]
                phi0_row = tphi0[t_i, :][None]
                per_row = tper[t_i, :][None]
                adiff = per_row * phi - phi0_row
                amber = -per_row * k_row * jnp.sin(adiff)
                deltap = phi - phi0_row
                deltap = deltap - 2.0 * jnp.pi * jnp.round(
                    deltap / (2.0 * jnp.pi)
                )
                charmm = 2.0 * k_row * deltap
                coeff = coeff + jnp.where(per_row > 0, amber, charmm)
            na2 = jnp.maximum(cax**2 + cay**2 + caz**2, _EPS)
            nb2 = jnp.maximum(cbx**2 + cby**2 + cbz**2, _EPS)
            n2d2 = jnp.maximum(b2n * b2n, _EPS)
            ff0 = (-coeff * b2n) / na2
            ff1 = (b1x * b2x + b1y * b2y + b1z * b2z) / n2d2
            ff2 = (b3x * b2x + b3y * b2y + b3z * b2z) / n2d2
            ff3 = (coeff * b2n) / nb2
            f0vx = ff0 * cax
            f0vy = ff0 * cay
            f0vz = ff0 * caz
            f3vx = ff3 * cbx
            f3vy = ff3 * cby
            f3vz = ff3 * cbz
            sx = ff1 * f0vx - ff2 * f3vx
            sy = ff1 * f0vy - ff2 * f3vy
            sz = ff1 * f0vz - ff2 * f3vz
            # scatter with alpha = -f0vec, beta = s, gamma = f3vec
            fx = fx + _mm(-f0vx, td12t) + _mm(sx, td23t) + _mm(f3vx, td34t)
            fy = fy + _mm(-f0vy, td12t) + _mm(sy, td23t) + _mm(f3vy, td34t)
            fz = fz + _mm(-f0vz, td12t) + _mm(sz, td23t) + _mm(f3vz, td34t)

            # --- moving harmonic SMD bias (potcalc.py:75-89) ---
            comx = jnp.sum(wdiff * x, axis=1, keepdims=True)  # com2-com1
            comy = jnp.sum(wdiff * y, axis=1, keepdims=True)
            comz = jnp.sum(wdiff * z, axis=1, keepdims=True)
            dist = jnp.sqrt(
                jnp.maximum(comx**2 + comy**2 + comz**2, _EPS)
            )
            # schedule held at cent_1 past T steps (NAMD colvars keeps
            # targetCenters after targetNumSteps — bias.HarmonicSMDBias)
            center = bias_c0 + bias_slope * jnp.minimum(t_step, bias_tmax)
            coefb = bias_fk * (dist - center) / dist
            fx = fx - coefb * comx * wdiff
            fy = fy - coefb * comy * wdiff
            fz = fz - coefb * comz * wdiff
            return fx, fy, fz

        def gaussians(shape):
            b1 = pltpu.prng_random_bits(shape)
            b2 = pltpu.prng_random_bits(shape)
            # uint32->f32 casts are unsupported in Mosaic: shift to 24 bits
            # then reinterpret as int32 (always non-negative) before casting
            u1 = pltpu.bitcast(
                pltpu.bitcast(b1, jnp.uint32) >> 8, jnp.int32
            ).astype(jnp.float32) * (1.0 / 16777216.0) + 5.9604645e-08
            u2 = pltpu.bitcast(
                pltpu.bitcast(b2, jnp.uint32) >> 8, jnp.int32
            ).astype(jnp.float32) * (1.0 / 16777216.0)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            return r * jnp.cos(2.0 * jnp.pi * u2), r * jnp.sin(
                2.0 * jnp.pi * u2
            )

        def noise3(i, shape):
            if host_rng:
                k = jax.random.fold_in(base_key, i)
                g = jax.random.normal(k, (3,) + shape, jnp.float32)
                return g[0], g[1], g[2]
            g1, g2 = gaussians(shape)
            g3, _ = gaussians(shape)
            return g1, g2, g3

        def step_body(gi, carry, force_eval):
            x, y, z, vx, vy, vz, fx, fy, fz = carry
            t_step = t0 + gi.astype(jnp.float32)
            half = 0.5 * dt
            # B: half kick with stored forces
            vx = vx + half * fx * minv
            vy = vy + half * fy * minv
            vz = vz + half * fz * minv
            if use_cons:
                vx, vy, vz = rattle(vx, vy, vz, x, y, z)
                rx, ry, rz = cgather(x, y, z)  # SHAKE reference directions
            # A: half drift
            xn = x + half * vx
            yn = y + half * vy
            zn = z + half * vz
            if use_cons:
                xn, yn, zn = shake(xn, yn, zn, rx, ry, rz)
            x, y, z = xn, yn, zn
            # O: exact OU solve with on-core noise (statically skipped at
            # T=0; interpret mode draws from the host PRNG via noise3)
            if temperature > 0.0:
                g1, g2, g3 = noise3(gi, x.shape)
                vx = c1 * vx + c2v * g1
                vy = c1 * vy + c2v * g2
                vz = c1 * vz + c2v * g3
            else:
                vx = c1 * vx
                vy = c1 * vy
                vz = c1 * vz
            if use_cons:
                vx, vy, vz = rattle(vx, vy, vz, x, y, z)
                rx, ry, rz = cgather(x, y, z)
            # A: half drift
            xn = x + half * vx
            yn = y + half * vy
            zn = z + half * vz
            if use_cons:
                xn, yn, zn = shake(xn, yn, zn, rx, ry, rz)
            x, y, z = xn, yn, zn
            # B: half kick with new forces
            fx, fy, fz = force_eval(x, y, z, t_step)
            vx = vx + half * fx * minv
            vy = vy + half * fy * minv
            vz = vz + half * fz * minv
            if use_cons:
                vx, vy, vz = rattle(vx, vy, vz, x, y, z)
            return x, y, z, vx, vy, vz, fx, fy, fz

        init_carry = (
            x_ref[:], y_ref[:], z_ref[:],
            vx_ref[:], vy_ref[:], vz_ref[:],
            fx_ref[:], fy_ref[:], fz_ref[:],
        )
        if use_gb and gb_every > 1:
            # Held-radii r-RESPA: Born radii (and, when aligned, the held
            # LCPO force) refresh once per k-step block at block-entry
            # positions; the Still pair force runs every step at current
            # geometry with the held radii; the descreening chain force is
            # evaluated on the block's first step (whose Still pass
            # provides der, and the entry born_pass's cached dI rows feed
            # the chain sweep) and held for the rest of the block — the
            # same slow-force MTS pattern NAMD uses, now covering the two
            # most expensive GB sub-passes. Program cost: TWO step_body
            # instances (first/held) instead of one.
            kgb = gb_every
            hold_sasa = use_sasa and sasa_every > 1

            def gb_force_delta(x, y, z):
                # whole GB polar force at these positions: (fused ring -
                # plain ring) isolates the Still pair term, plus the Born
                # self term's dE/dR and the descreening chain force
                born, born_inv, d_born_dpsi = born_pass(x, y, z)
                ffx, ffy, ffz, _, der = ring_pair_forces(
                    x, y, z, pair_tabs,
                    gb={
                        "born": born,
                        "born_inv": born_inv,
                        "uprime": _gb_uprime,
                        "qq_t": gqq_full,
                    },
                    **ring_kw,
                )
                pfx, pfy, pfz, _ = ring_pair_forces(
                    x, y, z, pair_tabs, **ring_kw
                )
                der = der - 0.5 * gqs * _gb_uprime(born, born_inv)
                ce = der * d_born_dpsi * (0.5 * grho)
                cfx, cfy, cfz = gb_chain_pass(x, y, z, ce)
                return ffx - pfx + cfx, ffy - pfy + cfy, ffz - pfz + cfz

            def slow_force(x, y, z):
                gfx, gfy, gfz = gb_force_delta(x, y, z)
                if hold_sasa:
                    sgx, sgy, sgz = sasa_pass(x, y, z)
                    gfx = gfx + sgx
                    gfy = gfy + sgy
                    gfz = gfz + sgz
                return gfx, gfy, gfz

            def slow_kick(carry, gf):
                # half-block impulse: v += (k dt / 2) F_slow / m, then
                # project constrained velocity components (RATTLE)
                x, y, z, vx, vy, vz, fx, fy, fz = carry
                hk = 0.5 * kgb * dt
                vx = vx + hk * gf[0] * minv
                vy = vy + hk * gf[1] * minv
                vz = vz + hk * gf[2] * minv
                if use_cons:
                    vx, vy, vz = rattle(vx, vy, vz, x, y, z)
                return (x, y, z, vx, vy, vz, fx, fy, fz)

            def feval_fast(xx, yy, zz, tt):
                return forces(xx, yy, zz, tt, fast_only=True)

            def blockg(j, state):
                carry, gf = state[:9], state[9:]
                carry = slow_kick(carry, gf)
                carry = jax.lax.fori_loop(
                    0, kgb,
                    lambda i, c: step_body(j * kgb + i, c, feval_fast),
                    carry,
                )
                gf = slow_force(carry[0], carry[1], carry[2])
                carry = slow_kick(carry, gf)
                return tuple(carry) + tuple(gf)

            # carried force is FAST-only inside this mode: peel the slow
            # component off the incoming total force (both were evaluated
            # at the same entry positions) and restore it on the way out
            gf0 = slow_force(init_carry[0], init_carry[1], init_carry[2])
            fast_init = init_carry[:6] + (
                init_carry[6] - gf0[0],
                init_carry[7] - gf0[1],
                init_carry[8] - gf0[2],
            )
            state = jax.lax.fori_loop(
                0, n_inner // kgb, blockg, fast_init + gf0
            )
            out = state[:6] + (
                state[6] + state[9],
                state[7] + state[10],
                state[8] + state[11],
            )
        elif use_sasa and sasa_every > 1:
            # Held-force MTS: one LCPO evaluation per k-step block, at the
            # block-entry positions (= where the carried total force was
            # last evaluated). The carried force stays the TOTAL force —
            # the block's first half-kick consumes it as-is (its embedded
            # nonpolar component is the previous block's held value, the
            # same O(k*dt) hold the schedule already accepts) and every
            # in-block force eval adds the fresh held term to fast forces.
            def block(j, carry):
                sx, sy, sz = sasa_pass(carry[0], carry[1], carry[2])

                def feval(xx, yy, zz, tt):
                    fxx, fyy, fzz = forces(xx, yy, zz, tt)
                    return fxx + sx, fyy + sy, fzz + sz

                def istep(i, c):
                    return step_body(j * sasa_every + i, c, feval)

                return jax.lax.fori_loop(0, sasa_every, istep, carry)

            out = jax.lax.fori_loop(
                0, n_inner // sasa_every, block, init_carry
            )
        else:
            out = jax.lax.fori_loop(
                0,
                n_inner,
                lambda i, c: step_body(i, c, forces),
                init_carry,
            )
        ox_ref[:], oy_ref[:], oz_ref[:] = out[0], out[1], out[2]
        ovx_ref[:], ovy_ref[:], ovz_ref[:] = out[3], out[4], out[5]
        ofx_ref[:], ofy_ref[:], ofz_ref[:] = out[6], out[7], out[8]

    row_spec = pl.BlockSpec(
        (block_r, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    def _split(arr, r, fill=0.0):
        out = jnp.full((3, r, n_pad), fill, jnp.float32)
        return out.at[:, :, :n].set(
            jnp.moveaxis(arr.astype(jnp.float32), -1, 0)
        )

    def advance(pos, vel, frc, t0, seed):
        r0 = pos.shape[0]
        r = ((r0 + block_r - 1) // block_r) * block_r
        if r != r0:
            pad = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (r - r0,) + a.shape[1:])]
            )
            pos, vel, frc = pad(pos), pad(vel), pad(frc)
        xs = _split(pos, r)
        vs = _split(vel, r)
        fs = _split(frc, r)
        in_tabs = list(ring_tables)
        tab_specs = [
            bcast((n_pad if use_dense_pairs else n_shifts, n_pad))
        ] * 9
        a_rows = ang[0].shape[1]
        in_tabs += list(ang[:4]) + [ang[4], ang[5]]
        tab_specs += [
            bcast((n_pad, a_rows)), bcast((n_pad, a_rows)),
            bcast((a_rows, n_pad)), bcast((a_rows, n_pad)),
            bcast((1, a_rows)), bcast((1, a_rows)),
        ]
        t_rows = tor[0].shape[1]
        in_tabs += list(tor[:6]) + [tor[6], tor[7], tor[8]]
        tab_specs += [
            bcast((n_pad, t_rows))] * 3 + [bcast((t_rows, n_pad))] * 3 + [
            bcast((max_t, t_rows))] * 3
        in_tabs += list(lane_tables)
        tab_specs += [bcast((1, n_pad))] * 5
        if use_cons:
            in_tabs += list(cons_tables)
            tab_specs += [
                bcast((n_pad, c_pad)), bcast((c_pad, n_pad)),
                bcast((1, c_pad)), bcast((1, c_pad)), bcast((1, c_pad)),
            ]
        if use_gb:
            in_tabs += list(gb_shift_tables) + list(gb_lane_tables)
            tab_specs += [bcast((n_shifts, n_pad))] * 5 + [
                bcast((1, n_pad))
            ] * 5
        if use_sasa:
            in_tabs += list(sasa_tables)
            tab_specs += [
                bcast((n_pad, sasa_lc)), bcast((sasa_lc, n_pad)),
                bcast((sasa_w, 1)), bcast((1, sasa_w)),
                bcast((sasa_w, 1)), bcast((sasa_w, 1)),
                bcast((sasa_w, 1)), bcast((sasa_w, 1)),
            ]

        out_shape = [jax.ShapeDtypeStruct((r, n_pad), jnp.float32)] * 9
        scratch_shapes = []
        if use_gb:
            # per-shift HCT-derivative cache (mrow*dI*rinv, both integral
            # directions): ~2 x n_shifts x block_r x n_pad x 4B
            scratch_shapes += [
                pltpu.VMEM((n_shifts * block_r, n_pad), jnp.float32)
            ] * (6 if _GB_CHAIN_PROD else 2)
        if use_sasa:
            scratch_shapes += [
                pltpu.VMEM(
                    (block_r // 2 if sasa_pack else block_r, sasa_w),
                    jnp.float32,
                )
            ] * 6
        outs = pl.pallas_call(
            kernel,
            grid=(r // block_r,),
            in_specs=[smem_spec, smem_spec] + [row_spec] * 9 + tab_specs,
            out_specs=[row_spec] * 9,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            # the GB derivative cache and the SASA dense temporaries
            # overflow the default 16M scoped-VMEM budget; give them
            # explicit headroom
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=(
                    (96 if (use_gb and _GB_STATIC_BORN) else 48) * 1024 * 1024
                    if (use_sasa or use_gb)
                    # the shift/bonded tables are whole-block VMEM
                    # residents and scale ~n_pad^2: past one lane-tile of
                    # atoms the default 16M scoped budget is too small
                    # (tiled/large systems; ceiling is physical VMEM)
                    else (96 * 1024 * 1024 if n_pad > LANE else None)
                ),
            ),
        )(
            jnp.asarray(t0, jnp.int32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
            xs[0], xs[1], xs[2], vs[0], vs[1], vs[2], fs[0], fs[1], fs[2],
            *in_tabs,
        )

        def join(a, b, c):
            return jnp.stack(
                [a[:r0, :n], b[:r0, :n], c[:r0, :n]], axis=-1
            )

        return (
            join(outs[0], outs[1], outs[2]),
            join(outs[3], outs[4], outs[5]),
            join(outs[6], outs[7], outs[8]),
        )

    advance.n_inner = n_inner
    advance.block_r = block_r
    return advance
