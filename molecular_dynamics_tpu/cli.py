"""Command-line interface: ``mdx simulate | energy | train | bench``.

Replaces the reference's per-experiment shell scripts and SLURM writers
(experiment.sh, jobpip.sh, write_train_sbatch.py — SURVEY.md §L8) with one
entry point. A 50-replica NAMD campaign becomes ``mdx simulate`` on one
chip; ``mdx energy`` reproduces the V_Calculations potcalc printouts;
``mdx train`` drives the model-zoo loops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _meta_topology(ff, meta):
    """Minimal Topology from an npz example's metadata (name/residue tables
    for feature extraction, e.g. φ/ψ index tables)."""
    import numpy as np

    from molecular_dynamics_tpu.topology import Topology

    return Topology(
        atom_types=np.asarray(meta["atom_types"]),
        atom_names=np.asarray(meta["atom_names"]),
        res_names=np.asarray(meta["res_names"]),
        res_ids=np.asarray(meta["res_ids"], np.int64),
        charges=np.asarray(ff.charges, np.float64),
        masses=np.asarray(ff.masses, np.float64),
        bonds=np.asarray(ff.bonds, np.int64),
        angles=np.asarray(ff.angles, np.int64),
        dihedrals=np.asarray(ff.dihedrals, np.int64),
        impropers=np.asarray(ff.impropers, np.int64),
    )


def _load_system(topology: str, parameters: str, dtype=None):
    """Resolve a (topology, parameters) pair to
    (FFParams, coords, names, Topology)."""
    import numpy as np
    import jax.numpy as jnp

    from molecular_dynamics_tpu.ff import YamlForceField, build_ff_params

    if topology in ("example:backbone", ""):
        from molecular_dynamics_tpu.examples import (
            BACKBONE_FF_PRM,
            decaalanine_backbone,
        )

        top, coords = decaalanine_backbone()
        ff = build_ff_params(top, YamlForceField(BACKBONE_FF_PRM), dtype=dtype)
        return ff, np.asarray(coords), np.asarray(top.atom_names), top
    if topology == "example:full":
        from molecular_dynamics_tpu.examples import decaalanine_full

        ff, coords, meta = decaalanine_full(dtype=dtype)
        return ff, np.asarray(coords), meta["atom_names"], _meta_topology(ff, meta)
    if topology == "example:diala":
        from molecular_dynamics_tpu.examples import dialanine

        ff, coords, meta = dialanine(dtype=dtype)
        return ff, np.asarray(coords), meta["atom_names"], _meta_topology(ff, meta)

    if topology.endswith(".prmtop"):
        from molecular_dynamics_tpu.io import prmtop_to_ff_params, read_prmtop

        ff = prmtop_to_ff_params(topology, dtype=dtype)
        top, _ = read_prmtop(topology)
        coords = top.coords
        return ff, coords, np.asarray(top.atom_names), top

    from molecular_dynamics_tpu.io import read_psf

    top = read_psf(topology)
    ff = build_ff_params(top, YamlForceField(parameters), dtype=dtype)
    return ff, top.coords, np.asarray(top.atom_names), top


def cmd_simulate(args) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from molecular_dynamics_tpu import (
        HarmonicSMDBias,
        maxwell_boltzmann,
        minimize_fire,
        system_init,
        total_energy,
    )
    from molecular_dynamics_tpu.config import CampaignConfig, load_config, apply_overrides
    from molecular_dynamics_tpu.integrate import initialize_forces
    from molecular_dynamics_tpu.io import write_dcd, write_xyz
    from molecular_dynamics_tpu.log import write_simulation_log
    from molecular_dynamics_tpu.sim import simulate_ensemble
    from molecular_dynamics_tpu.system import replicate

    cfg = (
        load_config(args.config, CampaignConfig)
        if args.config
        else CampaignConfig()
    )
    cfg = apply_overrides(cfg, args.override or [])
    os.makedirs(cfg.out_dir, exist_ok=True)

    ff, coords, names, _ = _load_system(cfg.topology, cfg.parameters)
    if coords is None:
        print("topology carries no coordinates; provide a pdb", file=sys.stderr)
        return 2
    energy_cfg = cfg.sim.energy
    force = lambda p: -jax.grad(
        lambda q: total_energy(q, ff, config=energy_cfg)
    )(p)
    pos = jnp.asarray(coords, jnp.float32)
    if cfg.minimize_steps:
        pos = jax.jit(
            lambda p: minimize_fire(
                p, force, n_steps=cfg.minimize_steps,
                dt_start=0.001, dt_max=0.01,
            )
        )(pos)

    bias = None
    if cfg.colvar is not None:
        cv = cfg.colvar
        g1, g2 = list(cv.group1), list(cv.group2)
        cent_0 = cv.cent_0
        if cent_0 is None:
            c1 = pos[jnp.asarray(g1)].mean(0)
            c2 = pos[jnp.asarray(g2)].mean(0)
            cent_0 = float(jnp.linalg.norm(c2 - c1))
        bias = HarmonicSMDBias.create(
            n_atoms=ff.n_atoms, group1=g1, group2=g2,
            fk=cv.fk, cent_0=cent_0, cent_1=cv.cent_1, T=cv.T,
        )

    key = jax.random.PRNGKey(cfg.seed)
    state = system_init(
        pos, vel=maxwell_boltzmann(key, ff.masses, cfg.sim.temperature), key=key
    )
    def seed_force(p, b):
        e = lambda q: total_energy(q, ff, config=energy_cfg) + (
            bias.energy(q, 0) if bias is not None else 0.0
        )
        return -jax.grad(e)(p)

    state = initialize_forces(state, seed_force)
    ens = replicate(state, cfg.n_replicas, seed=cfg.seed)

    devices = getattr(args, "devices", 0) or cfg.devices
    mesh = None
    if devices and devices > 1:
        from molecular_dynamics_tpu.parallel import get_mesh, shard_ensemble

        mesh = get_mesh(devices)
        ens = shard_ensemble(ens, mesh)

    t0 = time.time()
    final, frames, log = simulate_ensemble(
        ens, ff, cfg.n_steps, cfg.save_every, cfg.sim, bias,
        mesh=mesh, obs_every=cfg.obs_every,
    )
    elapsed = time.time() - t0
    frames = np.asarray(frames)  # (saves, R, N, 3)

    for r in range(cfg.n_replicas):
        np.save(
            os.path.join(cfg.out_dir, f"raw-traj_rep-{r}.npy"), frames[:, r]
        )
    write_dcd(os.path.join(cfg.out_dir, "rep0.dcd"), frames[:, 0])
    write_xyz(
        os.path.join(cfg.out_dir, "rep0.xyz"), frames[:, 0],
        symbols=[str(n) for n in names],
    )
    write_simulation_log(os.path.join(cfg.out_dir, "sim_log.csv"), log)
    agg = cfg.n_steps * cfg.n_replicas / elapsed
    print(
        json.dumps(
            {
                "replicas": cfg.n_replicas,
                "steps": cfg.n_steps,
                "frames": list(frames.shape),
                "steps_per_sec": round(agg, 1),
                "out_dir": cfg.out_dir,
            }
        )
    )
    return 0


def cmd_energy(args) -> int:
    """Per-term energies of frames — the potcalc.py printout."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, energy_terms

    ff, coords, _, _ = _load_system(args.topology, args.parameters)
    if args.frames:
        frames = np.load(args.frames)
    elif coords is None:
        print(
            "topology carries no coordinates; pass --frames or a pdb",
            file=sys.stderr,
        )
        return 2
    else:
        frames = coords[None]
    fn = jax.jit(jax.vmap(lambda p: energy_terms(p, ff, config=REFERENCE_CONFIG)))
    out = fn(jnp.asarray(frames, jnp.float32))
    for i in range(frames.shape[0]):
        print({k: round(float(v[i]), 4) for k, v in out.items()})
    return 0


def cmd_train(args) -> int:
    from molecular_dynamics_tpu.train.drivers import run_training

    return run_training(
        family=args.family,
        data=args.data,
        data_stride=getattr(args, "stride", 1),
        topology=args.topology,
        parameters=args.parameters,
        epochs=args.epochs,
        batch_size=args.batch_size,
        out_dir=args.out_dir,
        seed=args.seed,
        devices=getattr(args, "devices", 0),
    )


def cmd_convert(args) -> int:
    """Trajectory conversion: dcd/xtc/xyz -> npy with selection + alignment.

    The Data_Processing_Scripts equivalents (dcd_to_npy-2.0.py,
    dcd_to_backbone_npy-2.0.py, dcd_to_aligned_backbone_npy-2.0.py).
    """
    import numpy as np

    from molecular_dynamics_tpu.io import read_dcd, read_xyz

    if args.input.endswith(".dcd"):
        frames, _ = read_dcd(args.input)
    elif args.input.endswith(".xyz"):
        frames = read_xyz(args.input)
    elif args.input.endswith(".xtc"):
        from molecular_dynamics_tpu.io import read_xtc

        frames = read_xtc(args.input)
    elif args.input.endswith(".mdxtc"):
        from molecular_dynamics_tpu.io import native

        frames = native.mdxtc_read(args.input)
    else:
        frames = np.load(args.input)

    if args.selection == "backbone":
        if not args.topology:
            print("--topology required for backbone selection", file=sys.stderr)
            return 2
        from molecular_dynamics_tpu.io import read_psf

        top = read_psf(args.topology)
        keep = np.isin(
            np.asarray([str(n) for n in top.atom_names]),
            ["N", "CA", "C", "O"],
        )
        frames = frames[:, keep]

    if args.align:
        # host numpy f64 Kabsch: precision must not depend on jax's global
        # x64 flag (the aligned-backbone converter's semantics,
        # dcd_to_aligned_backbone_npy-2.0.py)
        ref = np.asarray(frames[0], np.float64)
        ref_c = ref - ref.mean(axis=0)
        out = np.empty_like(np.asarray(frames, np.float64))
        for k, f in enumerate(np.asarray(frames, np.float64)):
            f_c = f - f.mean(axis=0)
            u, _, vt = np.linalg.svd(f_c.T @ ref_c, full_matrices=False)
            d = np.sign(np.linalg.det(vt.T @ u.T))
            r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
            out[k] = f_c @ r.T + ref.mean(axis=0)
        frames = out

    if args.output.endswith(".pdb"):
        # PDB emission for VMD (Alpha/predsToPDB.py:1-39): multi-model file
        # instead of the reference's one-file-per-frame loop
        from molecular_dynamics_tpu.io.pdb import write_pdb

        frames = np.asarray(frames, np.float64)
        n = frames.shape[-2]
        names = resnames = resids = None
        if args.topology:
            from molecular_dynamics_tpu.io import read_psf

            top = read_psf(args.topology)
            atoms = np.asarray([str(x) for x in top.atom_names], object)
            if args.selection == "backbone":
                sel = np.isin(atoms, ["N", "CA", "C", "O"])
                names = atoms[sel]
                resnames, resids = top.res_names[sel], top.res_ids[sel]
            elif len(atoms) == n:
                names = atoms
                resnames, resids = top.res_names, top.res_ids
        if names is None and n % 4 == 0:
            # reference backbone heuristic: N/CA/C/O x (n/4), resname ALA
            names = np.array(["N", "CA", "C", "O"] * (n // 4), object)
            resnames = np.array(["ALA"] * n, object)
            resids = np.repeat(np.arange(1, n // 4 + 1), 4)
        if names is None:
            names = np.array(["C"] * n, object)
        write_pdb(args.output, frames, names, resnames=resnames, resids=resids)
    else:
        np.save(args.output, np.asarray(frames, np.float32))
    print(f"{args.input} -> {args.output} {frames.shape}")
    return 0


def cmd_bench(args) -> int:
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.call([sys.executable, os.path.join(root, "bench.py")])


def main(argv=None) -> int:
    # persistent compile cache: repeat invocations of the same trainer /
    # campaign skip XLA recompilation (first compiles through the remote
    # TPU tunnel cost minutes; bench.py and conftest set the same dir)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache"),
    )
    parser = argparse.ArgumentParser(
        prog="mdx", description="TPU-native molecular dynamics framework"
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_sim = sub.add_parser("simulate", help="run a replica MD/SMD campaign")
    p_sim.add_argument("--config", default=None, help="YAML campaign config")
    p_sim.add_argument(
        "-o", "--override", action="append",
        help="dotted config override, e.g. n_replicas=8",
    )
    p_sim.add_argument(
        "--devices", type=int, default=0,
        help="shard the replica axis over an N-device mesh (the one-flag "
        "replacement for the reference's SLURM replica fan-out)",
    )
    p_sim.set_defaults(fn=cmd_simulate)

    p_en = sub.add_parser("energy", help="print per-term energies of frames")
    p_en.add_argument("--topology", default="example:backbone")
    p_en.add_argument("--parameters", default="")
    p_en.add_argument("--frames", default=None, help="npy of (F, N, 3)")
    p_en.set_defaults(fn=cmd_energy)

    p_tr = sub.add_parser("train", help="train a model family")
    p_tr.add_argument("family", choices=[
        "pretrain", "cgan", "hnn", "hnn-schnet", "hnn-latent", "lstm", "lstm-nll", "seq2seq",
        "seq2seq-graph", "seq2seq-gan", "lstm-gat", "aae", "flow", "vae", "transformer",
        "gat", "sde", "node",
    ])
    p_tr.add_argument("--data", default="", help="npy glob of trajectories")
    p_tr.add_argument(
        "--stride", type=int, default=1,
        help="frame stride applied when loading --data trajectories "
        "(the reference loaders stride x10, GAN_V37/gan.py:44-47)",
    )
    p_tr.add_argument("--topology", default="example:backbone")
    p_tr.add_argument("--parameters", default="")
    p_tr.add_argument("--epochs", type=int, default=3)
    p_tr.add_argument("--batch-size", type=int, default=32)
    p_tr.add_argument("--out-dir", default="runs")
    p_tr.add_argument("--seed", type=int, default=0)
    p_tr.add_argument(
        "--devices", type=int, default=0,
        help="data-parallel training over an N-device mesh (replicated "
        "params, sharded batches)",
    )
    p_tr.set_defaults(fn=cmd_train)

    p_cv = sub.add_parser("convert", help="trajectory -> npy conversion")
    p_cv.add_argument("input")
    p_cv.add_argument("output")
    p_cv.add_argument(
        "--selection", choices=["all", "backbone"], default="all"
    )
    p_cv.add_argument("--align", action="store_true",
                      help="Kabsch-align all frames to the first")
    p_cv.add_argument("--topology", default=None)
    p_cv.set_defaults(fn=cmd_convert)

    p_be = sub.add_parser("bench", help="run the headline benchmark")
    p_be.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
