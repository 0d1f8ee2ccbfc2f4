#!/usr/bin/env python
"""Scratch: re-evaluate a trained full-rep lstm checkpoint's rollout with
the hardened FIRE corrector (no retrain). Not part of the library surface.

Usage: python scripts/scratch_eval_lstm_corr.py <run_dir> <fire_steps...>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")

from molecular_dynamics_tpu.evaluate import compare_e2e, unwhiten
from molecular_dynamics_tpu.examples import decaalanine_full
from molecular_dynamics_tpu.models.seq import LSTMPredictor
from molecular_dynamics_tpu.train import checkpoint
from molecular_dynamics_tpu.train.datasets import TrajectoryData
from molecular_dynamics_tpu.train.drivers import _whitened
from molecular_dynamics_tpu.train.seq import (
    autoregressive_rollout,
    make_frame_corrector,
    make_langevin_corrector,
)


def main():
    run_dir = sys.argv[1]
    fire_specs = sys.argv[2:] or ["8"]  # "<n>" or "<n>:pin[<fk>]"
    ff, _, _ = decaalanine_full()
    n = ff.n_atoms
    feat = n * 3
    raw = TrajectoryData.from_npy_glob(
        "/tmp/data_r4/smd_gbis/raw-traj_rep-*.npy", stride=10
    )
    traj, w_mean, w_std = _whitened(raw)
    model = LSTMPredictor(out_dim=feat)
    history = 15
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, history, feat))
    )
    params = checkpoint.load(os.path.join(run_dir, "best.ckpt"), params)
    roll_len = int(np.mean([len(t) for t in traj.trajectories]))
    data_frames, _ = raw.stacked()

    def score(correct, tag):
        rolls = []
        for t_arr in traj.trajectories[:8]:
            w0 = jnp.asarray(t_arr[:history].reshape(history, feat))
            fr = autoregressive_rollout(
                model, params, w0, n_steps=roll_len, corrector=correct
            )
            rolls.append(
                unwhiten(np.asarray(fr).reshape(-1, n, 3), w_mean, w_std)
            )
        gen = np.concatenate(rolls)
        m = compare_e2e(
            gen, np.asarray(data_frames),
            data_trajectories=raw.trajectories,
            generated_trajectories=rolls,
        )
        cen = gen - gen.mean(axis=1, keepdims=True)
        rg = float(np.sqrt((cen**2).sum(axis=(1, 2)) / gen.shape[1]).mean())
        cen_d = data_frames - data_frames.mean(axis=1, keepdims=True)
        rg_d = float(
            np.sqrt((cen_d**2).sum(axis=(1, 2)) / data_frames.shape[1]).mean()
        )
        print(
            f"{tag}: e2e mean {m['mean_abs_error']:.3f} max "
            f"{m['max_abs_error']:.3f} Rg err {abs(rg - rg_d):.3f} "
            f"finite={np.isfinite(gen).all()}"
        )

    score(None, "no-corrector")
    for spec in fire_specs:
        parts = spec.split(":")
        mode = parts[0] if parts[0] in ("fire", "langevin") else "fire"
        if parts[0] in ("fire", "langevin"):
            parts = parts[1:]
        maker = (
            make_langevin_corrector if mode == "langevin"
            else make_frame_corrector
        )
        kwargs = {"n_steps": int(parts[0])}
        if len(parts) > 1:
            assert parts[1].startswith("pin"), spec
            kwargs["pin_groups"] = (0, n - 1)
            if parts[1][3:]:
                kwargs["pin_fk"] = float(parts[1][3:])
        score(maker(ff, w_mean, w_std, **kwargs), f"{mode}:{':'.join(parts)}")


if __name__ == "__main__":
    main()
