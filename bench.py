#!/usr/bin/env python
"""Headline benchmark: decaalanine integration throughput on one chip.

Measures aggregate Langevin-SMD integration steps/sec for the 104-atom
full-representation deca-alanine across 1024 vmapped replicas (BASELINE.md
north star: >= 1e6 steps/sec aggregate). The whole campaign is one jitted
``lax.fori_loop`` of fused force+BAOAB steps — the TPU replacement for the
reference's 50 independent NAMD jobs (SURVEY.md §3.5).

One invocation measures three protocols and prints ONE JSON line:

- primary: rigidBonds ALL @ 2 fs vacuum/RFA (torchmd tutorial physics,
  Test-1/tutorial.ipynb cells 13-18),
- secondary ``gbis``: + in-kernel GB-OBC polar solvation (NAMD ``gbis on``,
  gendirs_GBIS.py:55-63),
- secondary ``gbis_sasa``: + in-kernel LCPO SASA (NAMD ``sasa on``,
  gendirs_GBIS.py:64) — the full protocol that generated the reference's
  training data.

Env knobs: MDX_BENCH_GBIS=1 / MDX_BENCH_SASA=1 promote those protocols to
the primary metric; MDX_BENCH_SECONDARY=0 skips the extra runs.
"""

import dataclasses
import json
import os
import sys
import time

# Benchmark must run on the real accelerator if present; fall back to CPU.
os.environ.setdefault("JAX_PLATFORMS", "")

import jax

if os.environ.get("MDX_BENCH_RBG", "1") == "1":
    # rbg PRNG: cheaper per-step thermostat noise on TPU than threefry
    jax.config.update("jax_default_prng_impl", "rbg")

# persistent compile cache: kernel variants recompile only when they change
jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from molecular_dynamics_tpu import (
    HarmonicSMDBias,
    maxwell_boltzmann,
    minimize_fire,
    system_init,
)
from molecular_dynamics_tpu.energy import (
    GBIS_POLAR_CONFIG,
    REFERENCE_CONFIG,
    total_energy,
)
from molecular_dynamics_tpu.examples import decaalanine_full
from molecular_dynamics_tpu.integrate import initialize_forces
from molecular_dynamics_tpu.sim import SimulationConfig, make_ensemble_step_fn
from molecular_dynamics_tpu.system import replicate

N_REPLICAS = int(os.environ.get("MDX_BENCH_REPLICAS", 1024))
N_STEPS = int(os.environ.get("MDX_BENCH_STEPS", 2000))
TARGET = 1e6  # aggregate steps/sec north star


def run_case(ff, pos, gbis: bool, sasa: bool, constrain: bool) -> float:
    """Measure one protocol; returns aggregate steps/sec."""
    n_atoms = ff.n_atoms
    e_cfg = GBIS_POLAR_CONFIG if gbis else REFERENCE_CONFIG

    # SMD campaign state: schedule starts at the current end-to-end distance
    key = jax.random.PRNGKey(0)
    vel = maxwell_boltzmann(key, ff.masses, 300.0)
    d0 = float(jnp.linalg.norm(pos[-1] - pos[0]))
    bias = HarmonicSMDBias.create(
        n_atoms=n_atoms, group1=[0], group2=[n_atoms - 1],
        fk=1.0, cent_0=d0, cent_1=d0 + 22.0, T=500_000,
    )
    cfg = SimulationConfig(
        dt_fs=2.0,
        temperature=300.0,
        gamma_ps=1.0,
        energy=e_cfg,
        fused_nonbonded=(
            os.environ.get("MDX_BENCH_FUSED", "1") == "1" and not gbis
        ),
        kernel_variant=os.environ.get("MDX_BENCH_KERNEL", "ring"),
        kernel_block_r=int(os.environ.get("MDX_BENCH_BLOCK_R", 0)),
        fused_campaign=os.environ.get("MDX_BENCH_CAMPAIGN", "1") == "1",
    )
    # NAMD campaign protocol: rigidBonds ALL at 2 fs (gendirs_GBIS.py:66) —
    # SHAKE/RATTLE runs inside the fused kernel. MDX_BENCH_CONSTRAIN=0
    # benches the unconstrained kernel.
    cons = None
    if constrain:
        from molecular_dynamics_tpu.constraints import hydrogen_bond_constraints

        hb = hydrogen_bond_constraints(ff)
        cons = hb if hb.n_constraints else None

    if cfg.fused_campaign:
        from molecular_dynamics_tpu.ops.fused_step import make_fused_campaign_op

        campaign = make_fused_campaign_op(
            ff, n_inner=int(os.environ.get("MDX_BENCH_INNER", 50)),
            dt_fs=cfg.dt_fs, temperature=cfg.temperature,
            gamma_ps=cfg.gamma_ps,
            cutoff=e_cfg.cutoff, switch_dist=e_cfg.switch_dist,
            rfa=e_cfg.rfa, solvent_dielectric=e_cfg.solvent_dielectric,
            bias=bias,
            constraints=cons,
            shake_iters=int(os.environ.get("MDX_BENCH_SHAKE_ITERS", 6)),
            rattle_iters=int(os.environ.get("MDX_BENCH_RATTLE_ITERS", 3)),
            gb=gbis,
            ion_concentration=e_cfg.ion_concentration if gbis else 0.0,
            sasa=sasa,
            # r-RESPA cadence for the slow LCPO nonpolar force (NAMD's
            # slow-force MTS pattern); physical parity vs every-step is
            # pinned by tests/test_fused_campaign.py
            sasa_every=int(os.environ.get("MDX_BENCH_SASA_EVERY", 5)),
            gb_every=int(os.environ.get("MDX_BENCH_GB_EVERY", 1)),
            block_r=int(os.environ.get("MDX_BENCH_CBLOCK", 128 if not gbis else 64)),
        )
    else:
        cfg = dataclasses.replace(cfg, constrain_h_bonds=cons is not None)
        step_fn = make_ensemble_step_fn(ff, cfg, bias)

    state = system_init(pos, vel=vel, key=key)
    state = initialize_forces(
        state,
        lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=e_cfg)
            + bias.energy(q, 0)
        )(p),
    )
    ensemble = replicate(state, N_REPLICAS, seed=1)

    if cfg.fused_campaign:

        @jax.jit
        def advance(states, n):
            inner = campaign.n_inner

            def seg(i, s):
                pos, vel, frc = campaign(
                    s.pos, s.vel, s.forces, s.step[0],
                    jnp.int32(1234) + i + s.step[0],
                )
                return s.replace(
                    pos=pos, vel=vel, forces=frc, step=s.step + inner
                )

            return jax.lax.fori_loop(0, n // inner, seg, states)
    else:

        @jax.jit
        def advance(states, n):
            return jax.lax.fori_loop(0, n, lambda _, s: step_fn(s), states)

    # warmup/compile
    ensemble = advance(ensemble, 10)
    jax.block_until_ready(ensemble.pos)

    t0 = time.perf_counter()
    ensemble = advance(ensemble, N_STEPS)
    jax.block_until_ready(ensemble.pos)
    elapsed = time.perf_counter() - t0

    assert bool(jnp.all(jnp.isfinite(ensemble.pos))), "trajectory diverged"
    return N_STEPS * N_REPLICAS / elapsed


def main():
    ff, coords, _ = decaalanine_full(dtype=jnp.float32)

    force = lambda p: -jax.grad(
        lambda q: total_energy(q, ff, config=REFERENCE_CONFIG)
    )(p)
    pos = jax.jit(
        lambda p: minimize_fire(p, force, n_steps=500, dt_start=0.001, dt_max=0.01)
    )(jnp.asarray(coords, jnp.float32))

    gbis = os.environ.get("MDX_BENCH_GBIS", "0") == "1"
    sasa = os.environ.get("MDX_BENCH_SASA", "0") == "1"
    constrain = os.environ.get("MDX_BENCH_CONSTRAIN", "1") == "1"
    primary = run_case(ff, pos, gbis=gbis or sasa, sasa=sasa, constrain=constrain)
    name = (
        "decaalanine_104atom_langevin_smd"
        + ("_gbis" if (gbis or sasa) else "")
        + ("_sasa" if sasa else "")
        + ("_rigidbonds" if constrain else "")
        + "_steps_per_sec_1024rep"
    )
    record = {
        "metric": name,
        "value": round(primary, 1),
        "unit": "steps/sec (aggregate)",
        "vs_baseline": round(primary / TARGET, 4),
    }

    # Secondary protocols (VERDICT r2 #2): the full NAMD campaign physics
    # numbers ride along in the same driver-captured JSON line.
    if os.environ.get("MDX_BENCH_SECONDARY", "1") == "1" and not (gbis or sasa):
        v_gb = run_case(ff, pos, gbis=True, sasa=False, constrain=constrain)
        v_full = run_case(ff, pos, gbis=True, sasa=True, constrain=constrain)
        record["secondary"] = {
            "gbis_steps_per_sec": round(v_gb, 1),
            "gbis_vs_baseline": round(v_gb / TARGET, 4),
            "gbis_sasa_steps_per_sec": round(v_full, 1),
            "gbis_sasa_vs_baseline": round(v_full / TARGET, 4),
        }

    print(json.dumps(record))


if __name__ == "__main__":
    main()
