#!/usr/bin/env python
"""Sweep the physics-corrector over a trained full-representation checkpoint.

Re-evaluates a committed checkpoint's generation map under different
``MDX_ROLLOUT_CORRECT`` specs without retraining (the corrector only acts
at generation time), reproducing each family driver's exact rollout —
the full-rep rescue workflow behind docs/TRAINING.md's corrected rows.
The reference's demonstrated capability is autoregressive rollout at full
representation (Molecule_Dynamics_v2/LSTM_V6/test.py:1-40 on the 104-atom
systems of GAN_V16.2_Full_Representation/gan.py:15); the corrector is the
TPU stack's differentiable-FF lever the reference could not afford.

Usage:
  python scripts/sweep_fullrep_corrector.py <family> <run_dir> \
      [--data GLOB] [--stride N] [--write] <spec...>

``spec`` is ``none`` or ``<fire|langevin>:<n>[:pin[<fk>]]``. With
``--write`` exactly one spec is given and eval.json (+ the generated xyz)
is written into <run_dir> with the spec recorded under
``rollout_corrector`` — the committed-artifact path. Without it, specs are
scored into a scratch dir and printed as a table.

Supersedes scripts/scratch_eval_lstm_corr.py (lstm-only, round 4).
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")

from molecular_dynamics_tpu.evaluate import unwhiten
from molecular_dynamics_tpu.examples import decaalanine_full
from molecular_dynamics_tpu.train import checkpoint
from molecular_dynamics_tpu.train.datasets import TrajectoryData
from molecular_dynamics_tpu.train.drivers import (
    _eval_generated,
    _eval_rollout_ensemble,
    _export_xyz,
    _whitened,
)
from molecular_dynamics_tpu.train.seq import corrector_from_spec


def _gen_lstm(ff, run_dir, raw, spec, key, rolls=8):
    """Driver map: _run_lstm (drivers.py) — whitened autoregressive_rollout."""
    from molecular_dynamics_tpu.models.seq import LSTMPredictor
    from molecular_dynamics_tpu.train.seq import autoregressive_rollout

    n, feat, history = ff.n_atoms, ff.n_atoms * 3, 15
    traj, w_mean, w_std = _whitened(raw)
    model = LSTMPredictor(out_dim=feat)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, history, feat)))
    params = checkpoint.load(os.path.join(run_dir, "best.ckpt"), params)
    correct = corrector_from_spec(ff, w_mean, w_std, spec)
    roll_len = int(np.mean([len(t) for t in traj.trajectories]))
    outs = []
    for t_arr in traj.trajectories[:rolls]:
        w0 = jnp.asarray(t_arr[:history].reshape(history, feat))
        fr = autoregressive_rollout(
            model, params, w0, n_steps=roll_len, corrector=correct
        )
        outs.append(unwhiten(np.asarray(fr).reshape(-1, n, 3), w_mean, w_std))
    return outs


def _gen_seq2seq(ff, run_dir, raw, spec, key, rolls=8):
    """Driver map: _run_seq2seq — whitened chained_decode_rollout."""
    from molecular_dynamics_tpu.models.seq import Seq2Seq
    from molecular_dynamics_tpu.train.seq import chained_decode_rollout

    n, feat = ff.n_atoms, ff.n_atoms * 3
    history, decode_len = 10, 5
    traj, w_mean, w_std = _whitened(raw)
    model = Seq2Seq(out_dim=feat)
    params = model.init(
        key, jnp.zeros((1, history, feat)), jax.random.PRNGKey(0), decode_len
    )
    params = checkpoint.load(os.path.join(run_dir, "best.ckpt"), params)
    correct = corrector_from_spec(ff, w_mean, w_std, spec)
    roll_len = int(np.mean([len(t) for t in traj.trajectories]))
    roll_chain = jax.jit(
        lambda p, w0, k: chained_decode_rollout(
            model, p, w0, k, decode_len, roll_len, corrector=correct
        )
    )
    outs = []
    for t_arr in traj.trajectories[:rolls]:
        w0 = jnp.asarray(t_arr[:history].reshape(history, feat))
        key, sub = jax.random.split(key)
        gen = roll_chain(params, w0, sub)
        outs.append(unwhiten(np.asarray(gen).reshape(-1, n, 3), w_mean, w_std))
    return outs


def _gen_hnn(ff, run_dir, raw, spec, key, rolls=8):
    """Driver map: _run_hnn — raw phase-space rollout, pos-half corrector."""
    from molecular_dynamics_tpu.models.hnn import HNN, rollout
    from molecular_dynamics_tpu.train.datasets import phase_space_pairs

    x, dx = phase_space_pairs(raw)
    seg_lens = [len(t) - 2 for t in raw.trajectories]
    seg_starts = np.cumsum([0] + seg_lens)[:-1]
    model = HNN(hidden=(200, 200))
    params = model.init(key, jnp.zeros((x.shape[1],)))
    params = checkpoint.load(os.path.join(run_dir, "best.ckpt"), params)
    roll_len = int(np.mean([len(t) for t in raw.trajectories]))
    max_step = float(np.quantile(np.abs(dx), 0.999)) * 2.0
    pos_correct = corrector_from_spec(
        ff, np.zeros(ff.n_atoms * 3), np.ones(ff.n_atoms * 3), spec
    )
    correct = None
    if pos_correct is not None:
        half_dim = x.shape[1] // 2
        correct = lambda st: jnp.concatenate(
            [pos_correct(st[:half_dim]), st[half_dim:]]
        )
    outs = []
    for st in seg_starts[:rolls]:
        frames = rollout(
            model, params, jnp.asarray(x[st]), n_steps=roll_len, dt=1.0,
            max_step=max_step, corrector=correct,
        )
        half = frames.shape[1] // 2
        outs.append(np.asarray(frames[:, :half]).reshape(len(frames), -1, 3))
    return outs


def _gen_vae(ff, run_dir, raw, spec, key, rolls=8):
    """Driver map: _run_vae — decode 10 bucket-conditioned frames, relax."""
    from molecular_dynamics_tpu.models.vae import ConditionalVAE

    n = ff.n_atoms
    _, w_mean, w_std = _whitened(raw)
    model = ConditionalVAE(out_dim=n * 3)
    params = model.init(
        key, jnp.zeros((1, n * 3)), jnp.zeros((1,), jnp.int32), key
    )
    params = checkpoint.load(os.path.join(run_dir, "best.ckpt"), params)
    correct = corrector_from_spec(ff, w_mean, w_std, spec)
    z = jax.random.normal(key, (10, model.latent_dim))
    decoded = model.apply(
        params, z, jnp.arange(10), method=ConditionalVAE.decode
    )
    if correct is not None:
        decoded = jax.vmap(correct)(decoded)
    return unwhiten(np.asarray(decoded).reshape(10, n, 3), w_mean, w_std)


GEN = {
    "lstm": _gen_lstm,
    "seq2seq": _gen_seq2seq,
    "hnn": _gen_hnn,
    "vae": _gen_vae,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=sorted(GEN))
    ap.add_argument("run_dir")
    ap.add_argument("specs", nargs="+")
    ap.add_argument(
        "--data", default="/tmp/data_r4/smd_gbis/raw-traj_rep-*.npy"
    )
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument(
        "--write", action="store_true",
        help="write eval.json + generated xyz into run_dir (one spec only)",
    )
    ap.add_argument(
        "--rolls", type=int, default=8,
        help="rollouts per evaluation (one per data trajectory start); "
        "the committed full-rep rows use 24 — the 8-rollout default "
        "carries bucket-mean noise ~ +-1 A at full-rep ensemble spreads",
    )
    ap.add_argument(
        "--key", type=int, default=0,
        help="base PRNG key for the generation maps that sample noise "
        "(seq2seq/vae) — vary to measure rollout-ensemble eval variance",
    )
    args = ap.parse_args()
    if args.write and len(args.specs) != 1:
        ap.error("--write takes exactly one spec")

    ff, _, meta = decaalanine_full()
    names = meta["atom_names"]
    raw = TrajectoryData.from_npy_glob(args.data, stride=args.stride)
    for spec in args.specs:
        key = jax.random.PRNGKey(args.key)
        gen = GEN[args.family](ff, args.run_dir, raw, spec, key, args.rolls)
        out = args.run_dir if args.write else tempfile.mkdtemp()
        extra = {} if spec == "none" else {"rollout_corrector": spec}
        if args.family == "vae":
            m = _eval_generated(out, args.family, gen, raw, extra=extra)
        else:
            m = _eval_rollout_ensemble(out, args.family, gen, raw, extra=extra)
        if args.write:
            frames = gen if args.family == "vae" else gen[0]
            _export_xyz(
                os.path.join(out, f"{args.family}_corrected.xyz"),
                np.asarray(frames), names,
            )
        print(
            f"[{args.family}] {spec}: e2e {m['mean_abs_error']:.3f} "
            f"max {m['max_abs_error']:.3f} Rg {m['rg_abs_error']:.3f} "
            f"std {m['std_abs_error']:.3f}"
        )


if __name__ == "__main__":
    main()
