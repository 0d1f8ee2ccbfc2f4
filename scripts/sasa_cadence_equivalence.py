#!/usr/bin/env python
"""Campaign-length physical equivalence of the SASA r-RESPA cadence.

The bench's full-campaign headline runs the LCPO nonpolar force on a
held-force multiple-timestep cadence (sasa_every=5); the reference NAMD
config evaluates SASA every step (All_ML_Training_Data/210905_SMD_decaalanine/
SMD/gendirs_GBIS.py:63-75 sets no slow-force MTS). The short-horizon
soundness evidence (T=0 trajectory bound, NVE trace, thermostatted T/Rg
stats — tests/test_fused_gb.py::TestSASAMultipleTimestepping) is pinned;
this script adds the campaign-length comparison the short tests cannot see:
two independent full campaigns (64 replicas x 1 ns GBIS+SASA SMD, identical
seeds/protocol, k=1 vs k=5) compared on

- the SMD colvar work distribution over replicas (the quantity the
  reference's dataset exists to sample — Jarzynski-style pulling work),
- per-term potential-energy means over second-half frames (the ensemble
  the trained models consume),
- ensemble structure/thermo summaries (Rg, e2e, temperature, colvar lag).

Usage:
  python scripts/regenerate_smd.py --gbis --replicas 64 --max-dump 64 \
      --out <dir_k1>                       # sasa_every defaults to 1
  python scripts/regenerate_smd.py --gbis --replicas 64 --max-dump 8 \
      --sasa-every 5 --out <dir_k5>
  python scripts/sasa_cadence_equivalence.py <dir_k1> <dir_k5> \
      --out docs/artifacts/sasa_k_equiv.json

The committed artifact backs tests/test_fused_gb.py's campaign-equivalence
bounds (z-scores of the work/energy deltas against replica/frame spread).
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")

from molecular_dynamics_tpu.energy import GBIS_CONFIG, energy_terms
from molecular_dynamics_tpu.examples import decaalanine_full
from molecular_dynamics_tpu.evaluate import radius_of_gyration


def _colvar_series(campaign_dir, pull, fk):
    """Per-replica (colvar value, center) series.

    Prefers the full per-replica log (full_log.npz); falls back to the
    dumped frame files (the colvar IS the 0..N-1 atom distance, so frames
    reproduce it exactly at every save point).
    """
    npz = os.path.join(campaign_dir, "full_log.npz")
    if os.path.exists(npz):
        log = np.load(npz)
        return np.asarray(log["colvar_value"]), np.asarray(
            log["colvar_center"]
        )[:, 0]
    with open(os.path.join(campaign_dir, "summary.json")) as fh:
        summary = json.load(fh)
    d0 = summary["colvar_target_end_A"] - pull
    reps = sorted(
        glob.glob(os.path.join(campaign_dir, "raw-traj_rep-*.npy")),
        key=lambda p: int(p.rsplit("-", 1)[1].split(".")[0]),
    )
    cvs = []
    for p in reps:
        fr = np.load(p)  # (saves, N, 3)
        cvs.append(np.linalg.norm(fr[:, -1] - fr[:, 0], axis=-1))
        del fr
    cv = np.stack(cvs, axis=1)  # (saves, R)
    n_saves = cv.shape[0]
    steps = summary["steps"]
    save_every = steps // n_saves
    t = (np.arange(1, n_saves + 1) * save_every).astype(np.float64)
    center = d0 + pull * t / steps
    return cv, center


def _pull_work(cv, center, fk):
    """SMD work per replica: W_r = fk * sum_i (c_i - cv_ir) dc_i.

    dW = (dU/dc) dc with U = fk/2 (cv - c)^2 — the moving-restraint work
    the reference campaign samples (Jarzynski estimator input).
    """
    dc = np.diff(center, prepend=center[0])
    return fk * ((center[:, None] - cv) * dc[:, None]).sum(axis=0)


def _term_energy_stats(campaign_dir, ff, n_reps, frame_stride):
    """Per-term energy mean/sem over second-half frames of n_reps reps."""
    reps = sorted(
        glob.glob(os.path.join(campaign_dir, "raw-traj_rep-*.npy")),
        key=lambda p: int(p.rsplit("-", 1)[1].split(".")[0]),
    )[:n_reps]
    frames = []
    for p in reps:
        fr = np.load(p)
        frames.append(fr[len(fr) // 2 :: frame_stride])
    batch = np.concatenate(frames).astype(np.float32)

    terms_fn = jax.jit(
        jax.vmap(lambda q: energy_terms(q, ff, config=GBIS_CONFIG))
    )
    out = {}
    chunks = []
    for s in range(0, len(batch), 256):
        chunks.append(
            {k: np.asarray(v) for k, v in
             terms_fn(jnp.asarray(batch[s : s + 256])).items()}
        )
    for k in chunks[0]:
        vals = np.concatenate([c[k] for c in chunks])
        out[k] = {
            "mean": float(vals.mean()),
            "sem": float(vals.std() / np.sqrt(len(vals))),
        }
    rg = np.asarray(radius_of_gyration(jnp.asarray(batch), jnp.asarray(ff.masses)))
    out["_rg"] = {
        "mean": float(rg.mean()), "sem": float(rg.std() / np.sqrt(len(rg)))
    }
    return out, len(batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_k1")
    ap.add_argument("dir_k5")
    ap.add_argument("--pull", type=float, default=22.0)
    ap.add_argument("--fk", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--frame-stride", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    ff, _, _ = decaalanine_full(dtype=jnp.float32)
    arms = {}
    for label, d in (("k1", args.dir_k1), ("k5", args.dir_k5)):
        with open(os.path.join(d, "summary.json")) as fh:
            summary = json.load(fh)
        cv, center = _colvar_series(d, args.pull, args.fk)
        work = _pull_work(cv, center, args.fk)
        terms, n_frames = _term_energy_stats(
            d, ff, args.reps, args.frame_stride
        )
        half = len(cv) // 2
        arms[label] = {
            "dir": d,
            "replicas": cv.shape[1],
            "work_mean": float(work.mean()),
            "work_std": float(work.std()),
            "work_sem": float(work.std() / np.sqrt(len(work))),
            "colvar_lag_mean": float(
                (center[half:, None] - cv[half:]).mean()
            ),
            "energy_terms": terms,
            "energy_frames": n_frames,
            "summary": summary,
        }

    a, b = arms["k1"], arms["k5"]

    def z(ma, sa, mb, sb):
        return abs(ma - mb) / max(np.hypot(sa, sb), 1e-12)

    comparison = {
        "work": {
            "k1_mean": a["work_mean"], "k5_mean": b["work_mean"],
            "k1_std": a["work_std"], "k5_std": b["work_std"],
            "delta": b["work_mean"] - a["work_mean"],
            "z": z(a["work_mean"], a["work_sem"],
                   b["work_mean"], b["work_sem"]),
        },
        "temperature": {
            "k1": a["summary"]["temperature_mean_K"],
            "k5": b["summary"]["temperature_mean_K"],
            "delta": b["summary"]["temperature_mean_K"]
            - a["summary"]["temperature_mean_K"],
        },
        "rg": {
            "k1": a["summary"]["rg_mean_A"], "k5": b["summary"]["rg_mean_A"],
            "k1_std": a["summary"]["rg_std_A"],
            "k5_std": b["summary"]["rg_std_A"],
            "delta": b["summary"]["rg_mean_A"] - a["summary"]["rg_mean_A"],
        },
        "e2e_final": {
            "k1": a["summary"]["e2e_final_mean_A"],
            "k5": b["summary"]["e2e_final_mean_A"],
            "delta": b["summary"]["e2e_final_mean_A"]
            - a["summary"]["e2e_final_mean_A"],
        },
        "colvar_lag": {
            "k1": a["colvar_lag_mean"], "k5": b["colvar_lag_mean"],
            "delta": b["colvar_lag_mean"] - a["colvar_lag_mean"],
        },
        "energy_terms": {},
    }
    for k in sorted(a["energy_terms"]):
        ta, tb = a["energy_terms"][k], b["energy_terms"][k]
        comparison["energy_terms"][k] = {
            "k1_mean": ta["mean"], "k5_mean": tb["mean"],
            "delta": tb["mean"] - ta["mean"],
            "z": z(ta["mean"], ta["sem"], tb["mean"], tb["sem"]),
        }

    result = {"arms": arms, "comparison": comparison}
    print(f"{'quantity':<18}{'k=1':>12}{'k=5':>12}{'delta':>10}{'z':>8}")
    c = comparison
    print(f"{'SMD work':<18}{c['work']['k1_mean']:>12.2f}"
          f"{c['work']['k5_mean']:>12.2f}{c['work']['delta']:>10.2f}"
          f"{c['work']['z']:>8.2f}")
    for k, v in c["energy_terms"].items():
        print(f"{'E ' + k:<18}{v['k1_mean']:>12.2f}{v['k5_mean']:>12.2f}"
              f"{v['delta']:>10.2f}{v['z']:>8.2f}")
    for k in ("temperature", "rg", "e2e_final", "colvar_lag"):
        v = c[k]
        print(f"{k:<18}{v['k1']:>12.2f}{v['k5']:>12.2f}{v['delta']:>10.2f}")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
