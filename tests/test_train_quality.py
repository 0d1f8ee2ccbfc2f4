"""Training-quality regression guards (VERDICT r3 #3).

Two layers replace the old finiteness-only assert (``mean_abs_error < 100``):

1. **Artifact guard** — every committed ``runs_r3/<family>/eval.json`` must
   meet a golden ceiling of ~1.5x the docs/TRAINING.md value. Regenerating
   the model-zoo artifacts with a silently-regressed recipe fails here.

2. **Live-training guard** — representative families train on the committed
   ``datasets/backbone_smd`` data with a small fixed budget and seed (bit
   deterministic on CPU: re-runs reproduce mean_abs_error exactly), and the
   resulting e2e evaluator score must stay under a calibrated ceiling. A
   code change that damages datasets, models, drivers, or the evaluator
   fails here even if nobody regenerates runs_r3.

Ceilings carry ~1.7x headroom over the measured value so platform numerics
(CPU vs the axon TPU hijack) don't flake them; they are far below the
"trained nothing" regime (an untrained generator scores >4 A on this data).
Mirrors the reference's evaluator-as-gate pattern (GAN_V12.3.1/test.py:31-55)
which the reference itself never wired into CI.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "runs_r3")
DATA = os.path.join(REPO, "datasets", "backbone_smd", "raw-traj_rep-*.npy")

# Golden ceilings for the committed artifacts: ~1.5x the docs/TRAINING.md
# table (regenerations may wobble, not regress). Re-calibrated each round
# after retrains — round-4 lifted aae/flow/sde/seq2seq-graph far below the
# round-3 ceilings, which had become toothless (a 3.7x seq2seq-graph
# regression would have passed the old 3.8 ceiling).
# Rg ceilings: max(1.5x value, 0.45) — sub-0.1 A Rg errors are eval noise,
# a tighter bound would flake on platform numerics.
ARTIFACT_CEILING = {
    #          e2e mean   Rg err     (TRAINING.md: e2e, Rg)
    "aae": (1.6, 0.45),             # 1.037, 0.167
    "cgan": (0.85, 0.45),           # 0.547, 0.261
    "flow": (1.5, 0.45),            # 0.975, 0.106
    "gat": (2.3, 0.45),             # 1.489, 0.089
    "hnn": (1.1, 0.45),             # 0.702, 0.161
    "hnn-latent": (1.1, 0.45),      # 0.734, 0.050
    "hnn-schnet": (1.6, 1.1),       # 1.057, 0.732
    "lstm": (1.5, 0.45),            # 0.984, 0.027
    "lstm-gat": (1.0, 0.6),         # 0.646, 0.359
    "lstm-nll": (1.4, 0.45),        # 0.899, 0.093
    "node": (1.7, 2.3),             # 1.074, 1.469
    "pretrain": (1.0, 0.45),        # 0.648, 0.012
    "sde": (2.8, 0.45),             # 1.939, 0.050
    "seq2seq": (1.3, 0.45),         # 0.810, 0.117
    "seq2seq-graph": (1.6, 0.45),   # 1.013, 0.115
    "seq2seq-gan": (1.6, 0.45),     # 1.060, 0.034
    "transformer": (1.9, 0.45),     # 1.249, 0.100
    "vae": (1.7, 0.45),             # 1.106, 0.230
}


class TestCommittedArtifacts:
    @pytest.mark.parametrize("family", sorted(ARTIFACT_CEILING))
    def test_eval_json_meets_golden(self, family):
        path = os.path.join(RUNS, family, "eval.json")
        assert os.path.exists(path), f"missing committed artifact {path}"
        with open(path) as f:
            m = json.load(f)
        e2e_max, rg_max = ARTIFACT_CEILING[family]
        assert m["mean_abs_error"] <= e2e_max, (
            f"{family}: committed e2e mean {m['mean_abs_error']:.3f} A "
            f"exceeds golden ceiling {e2e_max} (1.5x the TRAINING.md value)"
        )
        assert m["rg_abs_error"] <= rg_max, (
            f"{family}: committed Rg err {m['rg_abs_error']:.3f} A "
            f"exceeds golden ceiling {rg_max}"
        )

    def test_sde_marginal_tv(self):
        with open(os.path.join(RUNS, "sde", "eval.json")) as f:
            m = json.load(f)
        assert m["marginal_tv_mean"] <= 0.24, (
            "sde marginal TV regressed past 1.5x the round-4 value (0.157)"
        )


# Live small-budget ceilings, calibrated on the committed dataset at the
# exact (epochs, batch_size=32, seed=0) budget below. Measured values under
# both precision regimes (x32 plain CPU / x64 as conftest sets) in the
# comments; the ceiling covers the worse of the two with ~1.6x headroom.
# An untrained generator scores >4 A on this data, a broken pipeline >10.
LIVE_BUDGET = {
    "pretrain": (4, 2.20),  # measured 0.515 (x32) / 1.382 (x64), 12-17 s
    "node": (8, 1.10),      # measured 0.618 (x32) / 0.180 (x64), ~52 s
    "cgan": (3, 2.60),      # measured 1.511 (x32) / 1.251 (x64), ~42 s
    "lstm": (8, 3.20),      # measured 1.856 (x32) / 1.982 (x64), ~83 s
    "lstm-gat": (6, 3.00),  # measured 1.842 (x32) / 1.839 (x64), ~4 min 1-core
}


class TestLiveTrainingQuality:
    @pytest.mark.parametrize("family", sorted(LIVE_BUDGET))
    def test_small_budget_quality(self, family, tmp_path):
        from molecular_dynamics_tpu.train.drivers import run_training

        epochs, ceiling = LIVE_BUDGET[family]
        rc = run_training(
            family=family,
            data=DATA,
            epochs=epochs,
            batch_size=32,
            out_dir=str(tmp_path),
            seed=0,
        )
        assert rc == 0
        with open(tmp_path / family / "eval.json") as f:
            m = json.load(f)
        assert np.isfinite(m["mean_abs_error"])
        assert m["mean_abs_error"] <= ceiling, (
            f"{family}: small-budget e2e mean {m['mean_abs_error']:.3f} A "
            f"exceeds calibrated ceiling {ceiling} — training quality "
            f"regressed (see tests/test_train_quality.py header)"
        )
