#!/usr/bin/env python
"""Sweep the physics-corrector over a trained SDE-GAN checkpoint's paths.

VERDICT r4 #3's bounded e2e lever: the committed sde row is the zoo's
worst e2e (1.94 A) while its marginal TV is probe-optimized. The SDE
generator emits whitened 8-frame coordinate windows; this script relaxes
each generated frame through the differentiable force field
(train.seq.make_fire/langevin corrector — the same
``MDX_ROLLOUT_CORRECT`` machinery as the full-rep rollout rescue) and
re-scores BOTH statistics per spec: the bucketed e2e evaluator (what the
corrector should fix) and the marginal TV (what it must not break).

Rebuilds the generator exactly like scripts/sde_tv_noiseband.py (same
knobs MDX_SDE_LATENT/NOISE/HIDDEN/TEMB, same window construction) and
uses one fixed generation key across specs so differences are the
corrector's, not sampling noise.

Usage:
  python scripts/sweep_sde_corrector.py <run_dir> [--data GLOB]
      [--paths 1024] [--write] <spec...>

``spec`` is ``none`` or ``<fire|langevin>:<n>[:pin[<fk>]]``. With
``--write`` exactly one spec is given and eval.json is rewritten into
<run_dir> with the spec recorded under ``rollout_corrector``.

Reference for the generator: TorchSDE/torchsde_v2/sde.py:207-254,437-478.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")

from molecular_dynamics_tpu.cli import _load_system
from molecular_dynamics_tpu.evaluate import marginal_histograms, unwhiten
from molecular_dynamics_tpu.models.sde import SDEGenerator
from molecular_dynamics_tpu.train import checkpoint
from molecular_dynamics_tpu.train.datasets import TrajectoryData
from molecular_dynamics_tpu.train.drivers import _eval_generated, _whitened
from molecular_dynamics_tpu.train.seq import corrector_from_spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("specs", nargs="+")
    ap.add_argument(
        "--data", default="datasets/backbone_smd/raw-traj_rep-*.npy"
    )
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--paths", type=int, default=1024)
    ap.add_argument(
        "--write", action="store_true",
        help="rewrite eval.json in run_dir (one spec only)",
    )
    args = ap.parse_args()
    if args.write and len(args.specs) != 1:
        ap.error("--write takes exactly one spec")

    ff, _, names, top = _load_system("example:backbone", "")
    raw = TrajectoryData.from_npy_glob(args.data, stride=args.stride)
    traj, w_mean, w_std = _whitened(raw)
    n = ff.n_atoms

    # the driver's exact window construction (_run_sde, drivers.py)
    path_len = 8
    wins = []
    for t_arr in traj.trajectories:
        flat = t_arr.reshape(len(t_arr), -1)
        for s in range(0, len(flat) - path_len + 1, path_len // 2):
            wins.append(flat[s : s + path_len])
    paths = np.stack(wins).astype(np.float32)
    feat = paths.shape[-1]

    temb_k = int(os.environ.get("MDX_SDE_TEMB", 0))
    _h = int(os.environ.get("MDX_SDE_HIDDEN", 128))
    gen = SDEGenerator(
        data_dim=feat,
        latent_dim=int(os.environ.get("MDX_SDE_LATENT", 64)),
        noise_dim=int(os.environ.get("MDX_SDE_NOISE", 16)),
        hidden=(_h, _h),
        cond_dim=2 * temb_k + 1 if temb_k else 0,
    )
    ts = jnp.linspace(0.0, 1.0, path_len)
    cond = None
    if temb_k:
        tv_ = np.linspace(0.0, 1.0, args.paths, dtype=np.float32)[:, None]
        feats = [tv_]
        for k_f in range(1, temb_k + 1):
            feats.append(np.sin(2.0 * np.pi * k_f * tv_))
            feats.append(np.cos(2.0 * np.pi * k_f * tv_))
        cond = jnp.asarray(np.concatenate(feats, axis=-1))
    params = gen.init(jax.random.PRNGKey(0), jax.random.PRNGKey(0), ts, 2,
                      cond[:2] if cond is not None else None)
    params = checkpoint.load(os.path.join(args.run_dir, "best.ckpt"), params)

    # one fixed draw shared by every spec: the driver evaluates with a
    # fresh split of its training key; PRNGKey(1000) is the first
    # noiseband ensemble (tv_noiseband.json's 0.157 entry for runs_r3/sde)
    fake = np.asarray(
        jax.jit(lambda k: gen.apply(params, k, ts, args.paths, cond))(
            jax.random.PRNGKey(1000)
        )
    )
    finite = np.isfinite(fake).all(axis=tuple(range(1, fake.ndim)))
    fake = fake[finite]

    for spec in args.specs:
        correct = corrector_from_spec(ff, w_mean, w_std, spec)
        if correct is None:
            corrected = fake
        else:
            flat = jnp.asarray(fake.reshape(-1, feat))
            corrected = np.asarray(jax.jit(jax.vmap(correct))(flat)).reshape(
                fake.shape
            )
        tv = marginal_histograms(corrected, paths)
        coords = unwhiten(corrected.reshape(-1, n, 3), w_mean, w_std)
        out = args.run_dir if args.write else tempfile.mkdtemp()
        extra = dict(tv)
        # data-vs-data floor, the driver's half/half split (seeded)
        half = np.random.default_rng(0).permutation(len(paths))
        extra["marginal_tv_floor"] = marginal_histograms(
            paths[half[: len(half) // 2]], paths[half[len(half) // 2 :]]
        )["marginal_tv_mean"]
        if spec != "none":
            extra["rollout_corrector"] = spec
        m = _eval_generated(out, "sde", coords, raw, extra=extra)
        print(
            f"[sde] {spec}: e2e {m['mean_abs_error']:.3f} "
            f"max {m['max_abs_error']:.3f} Rg {m['rg_abs_error']:.3f} "
            f"std {m['std_abs_error']:.3f} tv {tv['marginal_tv_mean']:.4f}"
        )


if __name__ == "__main__":
    main()
