"""Simulation campaigns: fused rollouts, replica ensembles, SMD regeneration.

This layer replaces the reference's L0 data-generation stack (NAMD configured
by SMD/gendirs_GBIS.py + one SLURM job per replica, SURVEY.md §3.5) and the
torchmd dynamics loop (Test-1/tutorial.ipynb cell 18): one jit-compiled
``lax.scan`` advances `save_every` integrator steps per emitted frame, and the
replica ensemble is a vmapped leading axis — 1024 replicas advance in one
device program instead of 50 cluster jobs.

Output mirrors the reference pipeline's artifacts: strided coordinate frames
(the `(frames, atoms, 3)` npy layout every model loader consumes), per-frame
energy/temperature logs (torchmd LogWriter keys), and colvar center/value
traces like NAMD's ``.colvars.traj``.
"""

from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from molecular_dynamics_tpu.energy import (
    DEFAULT_TERMS,
    EnergyConfig,
    REFERENCE_CONFIG,
    resolve_urey_bradley,
    total_energy,
)
from molecular_dynamics_tpu.ff.params import FFParams
from molecular_dynamics_tpu.integrate import (
    kinetic_energy,
    langevin_step,
    temperature,
    velocity_verlet_step,
)
from molecular_dynamics_tpu.system import MDState


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    """Static rollout options (hashable; safe to close over in jit)."""

    dt_fs: float = 2.0
    integrator: str = "langevin"  # "langevin" | "nve"
    temperature: float = 300.0
    gamma_ps: float = 1.0  # NAMD langevinDamping 1.0 (gendirs_GBIS.py:60)
    energy: EnergyConfig = REFERENCE_CONFIG
    #: enable minimum-image wrapping against state.box. Off by default — the
    #: reference workloads are implicit-solvent vacuum systems, and skipping
    #: the wrap statically saves ~15% of step time on the (R, N, N) tensors.
    pbc: bool = False
    #: use the fused Pallas nonbonded kernel (mdx.ops) on the ensemble path:
    #: bonded terms stay on the XLA grad path, LJ+Coulomb come from the
    #: VMEM-resident kernel with analytic forces. Requires lj+electrostatics
    #: in the energy terms and no PBC.
    fused_nonbonded: bool = False
    #: pair-kernel flavour: "ring" computes each pair once via cyclic-shift
    #: pairing (fastest); "dense" evaluates the full symmetric matrix
    #: (tightest f32 energy parity)
    kernel_variant: str = "ring"
    #: replicas per Pallas grid program (VMEM use scales with it)
    kernel_block_r: int = 0  # 0 -> variant default (ring: 64, dense: 8)
    #: run whole save_every-step segments inside ONE Pallas launch (state
    #: resident in VMEM, in-kernel RNG + analytic bonded forces). Fastest
    #: simulation path; not differentiable (training uses the paths above).
    #: Langevin + no PBC only.
    fused_campaign: bool = False
    #: constrain all bonds to hydrogen (NAMD rigidBonds all — the
    #: reference's data-generation protocol, gendirs_GBIS.py:66) via
    #: SHAKE/RATTLE: in-kernel matmul Jacobi sweeps on the fused campaign
    #: path, vmapped projection steps on the composed path.
    constrain_h_bonds: bool = False
    #: slow-force cadence for the LCPO SASA term on the fused campaign
    #: path (r-RESPA held-force multiple-timestepping, the pattern NAMD
    #: uses for its slow forces): evaluate the nonpolar force once per
    #: ``sasa_every`` steps and hold it between evaluations. Must divide
    #: ``save_every``. 1 = every step. Physical soundness (colvar track,
    #: Rg/temperature statistics, NVE drift vs every-step) is pinned by
    #: tests/test_fused_campaign.py.
    sasa_every: int = 1
    #: GB slow-force cadence for the in-kernel GB-OBC pass (impulse /
    #: Verlet-I r-RESPA): the whole GB polar force is evaluated once per
    #: ``gb_every`` steps and enters as half-block velocity kicks at the
    #: block boundaries; per-step evals run the plain pair loop. Must
    #: divide ``save_every``; when combined with ``sasa_every > 1`` the
    #: two cadences must be equal (the LCPO force rides the same
    #: impulse). Physical soundness pinned by tests/test_fused_gb.py.
    gb_every: int = 1


def make_step_fn(
    ff: FFParams,
    config: SimulationConfig = SimulationConfig(),
    bias=None,
) -> Callable[[MDState], MDState]:
    """Build the fused ``state -> state`` integrator step.

    The bias (e.g. :class:`~molecular_dynamics_tpu.bias.HarmonicSMDBias`)
    contributes energy at the state's step counter; its force arrives through
    ``jax.grad`` of the combined potential, matching how NAMD applies the
    colvar restraint force during data generation.
    """

    def potential(pos, box, step):
        e = total_energy(
            pos, ff, box=box if config.pbc else None, config=config.energy
        )
        if bias is not None:
            e = e + bias.energy(pos, step)
        return e

    def step_fn(state: MDState) -> MDState:
        force_fn = lambda pos, box: -jax.grad(potential)(pos, box, state.step)
        if config.integrator == "nve":
            return velocity_verlet_step(state, force_fn, ff.masses, config.dt_fs)
        return langevin_step(
            state,
            force_fn,
            ff.masses,
            config.dt_fs,
            config.temperature,
            config.gamma_ps,
        )

    return step_fn


def make_ensemble_step_fn(
    ff: FFParams,
    config: SimulationConfig = SimulationConfig(),
    bias=None,
) -> Callable[[MDState], MDState]:
    """Fused ensemble step: operates directly on batched (R, ...) states.

    With ``config.fused_nonbonded`` the LJ+Coulomb forces come from the
    Pallas kernel (one VMEM-resident pass over all replicas) while the cheap
    bonded/1-4/bias terms stay on the vmapped XLA grad path; otherwise this
    is equivalent to ``jax.vmap(make_step_fn(...))``.
    """
    use_fused = (
        config.fused_nonbonded
        and not config.pbc
        and set(config.energy.terms) == set(DEFAULT_TERMS)
    )
    if use_fused:
        # full fused force path: every 2-body term in the Pallas pair
        # kernel, angles/torsions as MXU matmuls — no gathers, no (R, N, N)
        # HBM tensors, no autodiff in the inner loop.
        from molecular_dynamics_tpu.ops import make_nonbonded_op
        from molecular_dynamics_tpu.ops.bonded import make_angle_torsion_op
        from molecular_dynamics_tpu.ops.ring import make_pair_ring_op

        make_pair = (
            make_pair_ring_op
            if config.kernel_variant == "ring"
            else make_nonbonded_op
        )
        block_r = config.kernel_block_r or (
            64 if config.kernel_variant == "ring" else 8
        )
        pair_op = make_pair(
            ff,
            cutoff=config.energy.cutoff,
            switch_dist=config.energy.switch_dist,
            rfa=config.energy.rfa,
            solvent_dielectric=config.energy.solvent_dielectric,
            include_bonds=True,
            include_14=True,
            include_ub=resolve_urey_bradley(config.energy, ff),
            block_r=block_r,
        )
        at_op = make_angle_torsion_op(
            ff, precision=jax.lax.Precision.HIGH
        )
        if bias is not None:
            bias_grad = jax.vmap(jax.grad(bias.energy))

        def fused_force(pos, steps):
            f = pair_op(pos)[1] + at_op(pos)[1]
            if bias is not None:
                f = f - bias_grad(pos, steps)
            return f

    def pot_single(pos, box, step):
        e = total_energy(
            pos, ff, box=box if config.pbc else None, config=config.energy
        )
        if bias is not None:
            e = e + bias.energy(pos, step)
        return e

    grad_single = jax.grad(pot_single)

    if config.constrain_h_bonds:
        from molecular_dynamics_tpu.constraints import (
            constrained_velocity_verlet_step,
            hydrogen_bond_constraints,
            make_batched_constrained_langevin_step,
        )

        cons = hydrogen_bond_constraints(ff)

    def step_fn(states: MDState) -> MDState:
        def force_fn(pos, box):
            if use_fused:
                return fused_force(pos, states.step)
            return -jax.vmap(grad_single)(pos, box, states.step)

        if config.constrain_h_bonds:
            if config.integrator == "nve":
                # RATTLE velocity-Verlet stays on the vmapped per-system path
                def single(s):
                    f1 = lambda p, b: -grad_single(p, b, s.step)
                    return constrained_velocity_verlet_step(
                        s, f1, ff.masses, cons, config.dt_fs
                    )

                return jax.vmap(single)(states)
            # batched g-BAOAB: matmul SHAKE/RATTLE over the whole replica
            # batch + one batched force evaluation (the fused pair kernel
            # stays usable on the vacuum term set)
            constrained_step = make_batched_constrained_langevin_step(
                force_fn, ff.masses, cons, config.dt_fs,
                config.temperature, config.gamma_ps,
            )
            return constrained_step(states)

        if config.integrator == "nve":
            return velocity_verlet_step(states, force_fn, ff.masses, config.dt_fs)
        return langevin_step(
            states,
            force_fn,
            ff.masses,
            config.dt_fs,
            config.temperature,
            config.gamma_ps,
        )

    return step_fn


def _observables(state: MDState, ff: FFParams, config: SimulationConfig, bias):
    # same box handling as the force path, so logged energies match the
    # dynamics actually simulated
    epot = total_energy(
        state.pos, ff,
        box=state.box if config.pbc else None,
        config=config.energy,
    )
    ekin = kinetic_energy(state.vel, ff.masses)
    if config.constrain_h_bonds:
        from molecular_dynamics_tpu.constraints import (
            constrained_temperature,
            hydrogen_bond_constraints,
        )

        n_cons = hydrogen_bond_constraints(ff).n_constraints
        temp = constrained_temperature(ekin, ff.masses.shape[0], n_cons)
    else:
        temp = temperature(ekin, ff.masses.shape[0])
    obs = {
        "step": state.step,
        "epot": epot,
        "ekin": ekin,
        "etot": epot + ekin,
        "T": temp,
    }
    if bias is not None:
        obs["colvar_center"] = bias.center(state.step)
        obs["colvar_value"] = bias.colvar(state.pos)
        obs["colvar_energy"] = bias.energy(state.pos, state.step)
    return obs


def simulate(
    state: MDState,
    ff: FFParams,
    n_steps: int,
    save_every: int = 50,
    config: SimulationConfig = SimulationConfig(),
    bias=None,
) -> Tuple[MDState, jnp.ndarray, dict]:
    """Run one system for ``n_steps``, emitting a frame every ``save_every``.

    Returns (final_state, frames (n_saves, N, 3), log dict of (n_saves,)
    arrays). Frame stride 50 matches the reference campaign's ``dcdfreq 50``
    (gendirs_GBIS.py:46). The whole rollout is one jit region: a scan over
    saves with a fori_loop of fused steps inside.
    """
    step_fn = make_step_fn(ff, config, bias)
    n_saves = n_steps // save_every

    @jax.jit
    def run(state):
        def segment(state, _):
            state = jax.lax.fori_loop(
                0, save_every, lambda _, s: step_fn(s), state
            )
            return state, (state.pos, _observables(state, ff, config, bias))

        return jax.lax.scan(segment, state, None, length=n_saves)

    final, (frames, log) = run(state)
    return final, frames, log


def simulate_ensemble(
    states: MDState,
    ff: FFParams,
    n_steps: int,
    save_every: int = 50,
    config: SimulationConfig = SimulationConfig(),
    bias=None,
    mesh=None,
    axis_name: str = "replica",
    obs_every: int = 1,
    save_forces: bool = False,
) -> Tuple[MDState, jnp.ndarray, dict]:
    """Replica-ensemble rollout: ``states`` has a leading replica axis.

    The vmapped equivalent of the reference's 50-job SLURM fan-out
    (SMD/jobpip.sh:33-50); shard the leading axis over a device mesh with
    ``mdx.parallel.shard_ensemble`` to scale across chips. The composed
    step is partitioned automatically by XLA SPMD; the fused campaign
    kernel is a custom call the partitioner cannot split, so pass the
    ``mesh`` here and the kernel is shard_mapped over the replica axis
    (``parallel.shard_campaign_advance``) with decorrelated per-shard
    thermostat streams.

    ``obs_every`` logs the observables dict only every Nth saved frame
    (frames are still saved every ``save_every`` steps): the per-term
    energy evaluation costs a full composed force-field pass per save,
    which can dominate low-replica campaigns driven by the fused kernel.
    ``n_steps // save_every`` must be divisible by it.

    ``save_forces=True`` additionally records the per-atom total forces of
    every saved frame — the reference's ``tclForces`` force-dump campaign
    variant (SMD_with_Forces/gendirs_GBIS_tcl-forces.py:90-122), which
    dumped forces per frame for the force-matching training lines.

    Returns (final_states, frames (n_saves, R, N, 3), log of
    (n_saves // obs_every, R)); with ``save_forces``, (final_states,
    frames, log, forces (n_saves, R, N, 3)).
    """
    n_saves = n_steps // save_every
    obs_every = max(1, int(obs_every))
    if n_saves % obs_every:
        raise ValueError(
            f"n_steps // save_every = {n_saves} must be divisible by "
            f"obs_every = {obs_every}"
        )
    obs_fn = functools.partial(_observables, ff=ff, config=config, bias=bias)

    term_set = set(config.energy.terms)
    campaign_gb = ff.has_gb and term_set in (
        set(DEFAULT_TERMS) | {"gb"},
        set(DEFAULT_TERMS) | {"gb", "sasa"},
    )
    campaign_sasa = campaign_gb and "sasa" in term_set
    use_campaign = (
        config.fused_campaign
        and config.integrator == "langevin"
        and not config.pbc
        # the campaign kernel covers the default term set, optionally plus
        # in-kernel GB-OBC and LCPO SASA (the full NAMD GBIS campaign);
        # reduced-term configs run on the composed XLA path
        and (term_set == set(DEFAULT_TERMS) or campaign_gb)
    )
    if use_campaign:
        from molecular_dynamics_tpu.ops.fused_step import fused_campaign_fits

        if not fused_campaign_fits(ff.n_atoms):
            # past ~4 lane-tiles of atoms the kernel's Mosaic compile is
            # pathological (docs/VALIDATION.md system-size table) — take
            # the composed XLA path instead of a compile hang
            warnings.warn(
                f"fused_campaign requested but the system ({ff.n_atoms} "
                "atoms) is past the VMEM-resident kernel's design point; "
                "dispatching to the composed XLA path "
                "(MDX_FUSED_FORCE=1 forces the kernel)",
                stacklevel=2,
            )
            use_campaign = False
    if use_campaign:
        from molecular_dynamics_tpu.ops.fused_step import (
            make_fused_campaign_op,
        )

        cons = None
        if config.constrain_h_bonds:
            # SHAKE/RATTLE runs inside the kernel (NAMD rigidBonds all,
            # the reference's 2 fs data-generation protocol)
            from molecular_dynamics_tpu.constraints import (
                hydrogen_bond_constraints,
            )

            hb = hydrogen_bond_constraints(ff)
            cons = hb if hb.n_constraints else None

        advance = make_fused_campaign_op(
            ff,
            n_inner=save_every,
            dt_fs=config.dt_fs,
            temperature=config.temperature,
            gamma_ps=config.gamma_ps,
            cutoff=config.energy.cutoff,
            switch_dist=config.energy.switch_dist,
            rfa=config.energy.rfa,
            solvent_dielectric=config.energy.solvent_dielectric,
            include_ub=resolve_urey_bradley(config.energy, ff),
            bias=bias,
            constraints=cons,
            gb=campaign_gb,
            ion_concentration=config.energy.ion_concentration,
            sasa=campaign_sasa,
            surface_tension=config.energy.surface_tension,
            sasa_every=config.sasa_every if campaign_sasa else 1,
            gb_every=config.gb_every if campaign_gb else 1,
            # the Mosaic kernel has no CPU lowering; interpret mode keeps
            # fused_campaign configs runnable in the CPU test environment
            interpret=jax.default_backend() != "tpu",
        )
        if mesh is not None:
            from molecular_dynamics_tpu.parallel import (
                shard_campaign_advance,
            )

            advance = shard_campaign_advance(advance, mesh, axis_name)

        def segment(states, _):
            seed_key = jax.random.fold_in(states.key[0], states.step[0])
            seed = jnp.right_shift(
                jax.random.bits(seed_key, dtype=jnp.uint32), 1
            ).astype(jnp.int32)
            pos, vel, frc = advance(
                states.pos, states.vel, states.forces,
                states.step[0], seed,
            )
            states = states.replace(
                pos=pos, vel=vel, forces=frc,
                step=states.step + save_every,
            )
            ys = (states.pos, states.forces) if save_forces else states.pos
            return states, ys

    else:
        step_fn = make_ensemble_step_fn(ff, config, bias)

        def segment(states, _):
            states = jax.lax.fori_loop(
                0, save_every, lambda _, s: step_fn(s), states
            )
            ys = (states.pos, states.forces) if save_forces else states.pos
            return states, ys

    @jax.jit
    def run(states):
        # observables every obs_every-th save: inner scan collects frames,
        # the (expensive) per-term energy log runs once per outer block
        def block(states, _):
            states, ys = jax.lax.scan(
                segment, states, None, length=obs_every
            )
            return states, (ys, jax.vmap(obs_fn)(states))

        return jax.lax.scan(block, states, None, length=n_saves // obs_every)

    final, (ys, log) = run(states)
    flat = lambda a: a.reshape((n_saves,) + a.shape[2:])
    if save_forces:
        return final, flat(ys[0]), log, flat(ys[1])
    return final, flat(ys), log


def smd_campaign_config(
    implicit_solvent: bool = False, sasa: bool = True
) -> Tuple[SimulationConfig, dict]:
    """The reference SMD data-generation protocol as config values:
    Langevin 300 K damping 1/ps, 2 fs steps, 500k steps, frames every 50,
    colvar 12 -> 34 A over the run (gendirs_GBIS.py:44-131).

    ``implicit_solvent=True`` switches the energy to the NAMD-campaign
    physics — GBIS with 0.1 M salt (``gbis on``, gendirs_GBIS.py:55-63)
    and rigid H bonds — instead of the vacuum torchmd-parity config.
    ``sasa=True`` (default) adds the LCPO nonpolar term (``sasa on``,
    gendirs_GBIS.py:64). Both variants run in the fused campaign kernel
    (GB ring passes; SASA as the dense in-kernel LCPO pass).
    """
    from molecular_dynamics_tpu.energy import GBIS_CONFIG, GBIS_POLAR_CONFIG

    if implicit_solvent:
        e_cfg = GBIS_CONFIG if sasa else GBIS_POLAR_CONFIG
    else:
        e_cfg = REFERENCE_CONFIG
    sim = SimulationConfig(
        dt_fs=2.0,
        temperature=300.0,
        gamma_ps=1.0,
        energy=e_cfg,
        constrain_h_bonds=implicit_solvent,
        fused_campaign=implicit_solvent,
    )
    colvar = {
        "fk": 1.0,
        "cent_0": 12.0,
        "cent_1": 34.0,
        "n_steps": 500_000,
        "save_every": 50,
    }
    return sim, colvar
