#!/usr/bin/env python
"""Measure the finite-sample noise band of the SDE marginal-TV statistic.

The committed sde row reports one marginal_tv_mean from one 1024-path
ensemble. Finite-sample TV is biased and noisy (~O(sqrt(n_bins/n)) per
feature even for identical distributions — evaluate.marginal_histograms
docstring), so comparing a single draw against a scalar target (<= 0.15,
VERDICT r3/r4) without a band is not rigorous. This script re-scores a
trained generator checkpoint with K independent ensembles and reports
mean/std/min/max of the statistic, plus the data-vs-data floor re-sampled
the same way — the honest uncertainty on the committed number.

Reproduces the driver's exact eval protocol (_run_sde, drivers.py): same
window construction, same whitening, same 1024-path draws. Respects the
committed recipe knobs (MDX_SDE_LATENT/NOISE/HIDDEN/TEMB) so the rebuilt
generator matches the checkpoint's shapes.

Usage:
  python scripts/sde_tv_noiseband.py <run_dir> \
      [--data 'datasets/backbone_smd/raw-traj_rep-*.npy'] [--stride 1] \
      [--ensembles 8] [--paths 1024] [--write]

Reference for the statistic: TorchSDE/torchsde_v2/sde.py:207-254.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")

from molecular_dynamics_tpu.evaluate import marginal_histograms
from molecular_dynamics_tpu.models.sde import SDEGenerator
from molecular_dynamics_tpu.train import checkpoint
from molecular_dynamics_tpu.train.datasets import TrajectoryData
from molecular_dynamics_tpu.train.drivers import _whitened


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--data", default="datasets/backbone_smd/raw-traj_rep-*.npy")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--ensembles", type=int, default=8)
    ap.add_argument("--paths", type=int, default=1024)
    ap.add_argument(
        "--write", action="store_true",
        help="record the band into <run_dir>/tv_noiseband.json",
    )
    args = ap.parse_args()

    raw = TrajectoryData.from_npy_glob(args.data, stride=args.stride)
    traj, _, _ = _whitened(raw)
    path_len = 8
    wins, win_t = [], []
    for t_arr in traj.trajectories:
        flat = t_arr.reshape(len(t_arr), -1)
        span = max(1, len(flat) - path_len)
        for s in range(0, len(flat) - path_len + 1, path_len // 2):
            wins.append(flat[s : s + path_len])
            win_t.append(s / span)
    paths = np.stack(wins).astype(np.float32)
    feat = paths.shape[-1]

    temb_k = int(os.environ.get("MDX_SDE_TEMB", 0))
    cond_dim = 2 * temb_k + 1 if temb_k else 0
    _h = int(os.environ.get("MDX_SDE_HIDDEN", 128))
    gen = SDEGenerator(
        data_dim=feat,
        latent_dim=int(os.environ.get("MDX_SDE_LATENT", 64)),
        noise_dim=int(os.environ.get("MDX_SDE_NOISE", 16)),
        hidden=(_h, _h),
        cond_dim=cond_dim,
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

    apply_j = jax.jit(lambda k: gen.apply(params, k, ts, args.paths, cond))
    rng = np.random.default_rng(0)
    tvs, floors = [], []
    for e in range(args.ensembles):
        fake = np.asarray(apply_j(jax.random.PRNGKey(1000 + e)))
        finite = np.isfinite(fake).all(axis=tuple(range(1, fake.ndim)))
        fake = fake[finite]
        tvs.append(marginal_histograms(fake, paths)["marginal_tv_mean"])
        # floor re-sampled per ensemble: a random half/half data split
        half = rng.permutation(len(paths))
        floors.append(
            marginal_histograms(
                paths[half[: len(half) // 2]], paths[half[len(half) // 2 :]]
            )["marginal_tv_mean"]
        )
        print(f"ensemble {e}: tv={tvs[-1]:.4f} floor={floors[-1]:.4f}")

    band = {
        "ensembles": args.ensembles,
        "paths_per_ensemble": args.paths,
        "tv_mean": float(np.mean(tvs)),
        "tv_std": float(np.std(tvs)),
        "tv_min": float(np.min(tvs)),
        "tv_max": float(np.max(tvs)),
        "tv_values": [round(float(t), 5) for t in tvs],
        "floor_mean": float(np.mean(floors)),
        "floor_std": float(np.std(floors)),
        "temb": temb_k,
    }
    print(json.dumps(band, indent=2))
    if args.write:
        with open(os.path.join(args.run_dir, "tv_noiseband.json"), "w") as fh:
            json.dump(band, fh, indent=2)


if __name__ == "__main__":
    main()
