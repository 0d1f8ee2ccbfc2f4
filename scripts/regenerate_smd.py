#!/usr/bin/env python
"""Regenerate the reference's SMD training-data campaign on one TPU chip.

The reference produced its training data with 50 independent NAMD cluster
jobs, each 500,000 Langevin steps (1 ns) of steered MD pulling deca-alanine's
end-to-end distance across 22 A, frames every 50 steps
(All_ML_Training_Data/210905_SMD_decaalanine/SMD/gendirs_GBIS.py + jobpip.sh).

This script runs the same protocol — Langevin 300 K, damping 1/ps, 2 fs
steps, 500k steps, moving harmonic colvar over the full run, dcdfreq 50 —
for ``--replicas`` replicas **in one program** using the fully-fused campaign
kernel, then writes the npy trajectories the reference's model loaders
consume, plus a DCD, the colvar/energy CSV log, and summary statistics.

Usage: python scripts/regenerate_smd.py --replicas 64 --steps 500000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import molecular_dynamics_tpu as mdx
from molecular_dynamics_tpu.energy import GBIS_CONFIG, REFERENCE_CONFIG, total_energy
from molecular_dynamics_tpu.examples import decaalanine_full
from molecular_dynamics_tpu.integrate import initialize_forces
from molecular_dynamics_tpu.io import write_dcd
from molecular_dynamics_tpu.log import write_simulation_log
from molecular_dynamics_tpu.sim import SimulationConfig, simulate_ensemble
from molecular_dynamics_tpu.system import replicate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--steps", type=int, default=500_000)
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--pull", type=float, default=22.0, help="colvar span (A)")
    ap.add_argument("--out", default="smd_campaign")
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument(
        "--gbis", action="store_true",
        help="full NAMD-campaign physics: GB-OBC+SASA implicit solvent, "
        "0.1 M salt, rigid H bonds (gendirs_GBIS.py:55-68) — all evaluated "
        "inside the fused campaign kernel",
    )
    ap.add_argument("--max-dump", type=int, default=4,
                    help="replicas to write npy/dcd for (stats use all)")
    ap.add_argument(
        "--forces", action="store_true",
        help="also dump per-atom total forces per saved frame "
        "(the reference's tclForces campaign variant, "
        "SMD_with_Forces/gendirs_GBIS_tcl-forces.py:90-122)",
    )
    ap.add_argument(
        "--obs-every", type=int, default=1,
        help="log observables every Nth saved frame (frames still saved "
        "every --save-every steps): the per-term energy log costs a full "
        "composed force-field pass per save, which dominates low-replica "
        "fused campaigns",
    )
    ap.add_argument(
        "--sasa-every", type=int, default=1,
        help="slow-force cadence for the LCPO nonpolar term (r-RESPA "
        "held-force MTS): evaluate SASA every k steps; must divide "
        "--save-every. 1 = every step (the conservative default for "
        "data generation; the bench default k=5 is ensemble-validated "
        "by tests/test_fused_gb.py::TestSASAMultipleTimestepping)",
    )
    ap.add_argument(
        "--chunk-steps", type=int, default=100_000,
        help="steps per device call: one monolithic 500k-step execution "
        "can exceed remote-backend execution limits; chunking keeps each "
        "call bounded (the MD state carries its step counter, so the SMD "
        "schedule continues seamlessly)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    ff, coords, meta = decaalanine_full(dtype=jnp.float32)
    n = ff.n_atoms
    e_cfg = GBIS_CONFIG if args.gbis else REFERENCE_CONFIG
    force = lambda p: -jax.grad(
        lambda q: total_energy(q, ff, config=e_cfg)
    )(p)
    pos = jax.jit(
        lambda p: mdx.minimize_fire(
            p, force, n_steps=1000, dt_start=1e-3, dt_max=1e-2
        )
    )(jnp.asarray(coords, jnp.float32))

    d0 = float(jnp.linalg.norm(pos[-1] - pos[0]))
    bias = mdx.HarmonicSMDBias.create(
        n_atoms=n, group1=[0], group2=[n - 1], fk=1.0,
        cent_0=d0, cent_1=d0 + args.pull, T=float(args.steps),
    )
    key = jax.random.PRNGKey(0)
    state = mdx.system_init(
        pos, vel=mdx.maxwell_boltzmann(key, ff.masses, 300.0), key=key
    )
    state = initialize_forces(
        state,
        lambda p, b: -jax.grad(
            lambda q: total_energy(q, ff, config=e_cfg)
            + bias.energy(q, 0)
        )(p),
    )
    ens = replicate(state, args.replicas, seed=1)

    cfg = SimulationConfig(
        dt_fs=2.0, temperature=300.0, gamma_ps=1.0,
        energy=e_cfg,
        fused_campaign=not args.no_fused,
        # the NAMD campaign ran rigidBonds ALL at 2 fs (gendirs_GBIS.py:66)
        constrain_h_bonds=args.gbis,
        sasa_every=args.sasa_every,
    )
    t0 = time.time()
    # chunks must be save_every (x obs_every) multiples: simulate_ensemble
    # only runs n_steps // save_every * save_every steps, so a ragged chunk
    # would silently shorten the campaign
    quantum = args.save_every * max(1, args.obs_every)
    chunk = max(quantum, min(args.chunk_steps, args.steps))
    chunk -= chunk % quantum
    total = args.steps - args.steps % quantum
    frames_parts, log_parts, force_parts = [], [], []
    states = ens
    done = 0
    while done < total:
        n_chunk = min(chunk, total - done)
        n_chunk -= n_chunk % quantum
        out = simulate_ensemble(
            states, ff, n_chunk, args.save_every, cfg, bias,
            obs_every=args.obs_every, save_forces=args.forces,
        )
        states, fr, lg = out[:3]
        if args.forces:
            force_parts.append(np.asarray(out[3]))
        frames_parts.append(np.asarray(fr))
        log_parts.append({k: np.asarray(v) for k, v in lg.items()})
        done += n_chunk
    assert done == total, (done, total)
    frames = np.concatenate(frames_parts)  # (saves, R, N, 3)
    log = {
        k: np.concatenate([p[k] for p in log_parts]) for k in log_parts[0]
    }
    elapsed = time.time() - t0

    # artifacts: reference-layout npy per replica (subset), one DCD, CSV log
    for r in range(min(args.replicas, args.max_dump)):
        np.save(
            os.path.join(args.out, f"raw-traj_rep-{r}.npy"), frames[:, r]
        )
    if args.forces:
        force_frames = np.concatenate(force_parts)
        for r in range(min(args.replicas, args.max_dump)):
            np.save(
                os.path.join(args.out, f"raw-forces_rep-{r}.npy"),
                force_frames[:, r],
            )
    write_dcd(os.path.join(args.out, "rep0.dcd"), frames[:, 0])
    strided_log = {k: np.asarray(v)[::20] for k, v in log.items()}
    write_simulation_log(os.path.join(args.out, "sim_log.csv"), strided_log)
    # full per-replica observable traces (saves, R): the campaign-level
    # physical-equivalence analysis (scripts/sasa_cadence_equivalence.py)
    # needs per-replica colvar/energy series over ALL replicas, which the
    # strided CSV (ensemble summaries) and the max_dump frame subset lose
    np.savez_compressed(os.path.join(args.out, "full_log.npz"), **log)

    from molecular_dynamics_tpu.evaluate import radius_of_gyration

    half = frames[frames.shape[0] // 2 :]
    rg = np.asarray(
        radius_of_gyration(
            jnp.asarray(half.reshape(-1, n, 3)), jnp.asarray(ff.masses)
        )
    )
    e2e_all = np.linalg.norm(
        frames[:, :, -1, :] - frames[:, :, 0, :], axis=-1
    )

    cv = np.asarray(log["colvar_value"])  # (saves, R)
    center = np.asarray(log["colvar_center"])[:, 0]
    temp = np.asarray(log["T"])
    lag = center[:, None] - cv
    summary = {
        "replicas": args.replicas,
        "physics": "gbis+sasa+rigidH" if args.gbis else "vacuum(rfa)",
        "rg_mean_A": round(float(rg.mean()), 3),
        "rg_std_A": round(float(rg.std()), 3),
        "e2e_mean_A": round(float(e2e_all.mean()), 2),
        "e2e_final_mean_A": round(float(e2e_all[-1].mean()), 2),
        "steps": args.steps,
        "wall_s": round(elapsed, 1),
        "aggregate_steps_per_sec": round(args.steps * args.replicas / elapsed, 1),
        "sim_ns_per_replica": args.steps * cfg.dt_fs / 1e6,
        "colvar_start_A": round(float(cv[0].mean()), 2),
        "colvar_end_A": round(float(cv[-1].mean()), 2),
        "colvar_target_end_A": round(float(center[-1]), 2),
        "colvar_mean_lag_A": round(float(lag[len(lag) // 2 :].mean()), 2),
        "temperature_mean_K": round(float(temp[len(temp) // 2 :].mean()), 1),
        "all_finite": bool(np.isfinite(frames).all()),
        "frames_shape": list(frames.shape),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
