#!/usr/bin/env python
"""Assemble docs/TRAINING.md from the eval.json files of a training sweep.

Usage: python scripts/summarize_training.py [runs_dir] [out_md]

Each family's driver writes ``eval.json`` (e2e-vs-data discrepancy along the
reaction coordinate — the reference's per-experiment test.py evaluator — plus
radius-of-gyration statistics and family-specific extras) and
``train_log.csv``. This collects them into one results table.
"""

import json
import os
import sys


def main():
    runs = sys.argv[1] if len(sys.argv) > 1 else "runs_convergence"
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/TRAINING.md"

    rows = []
    for fam in sorted(os.listdir(runs)):
        d = os.path.join(runs, fam)
        ev = os.path.join(d, "eval.json")
        log = os.path.join(d, "train_log.csv")
        metrics = {}
        if os.path.isfile(ev):
            with open(ev) as f:
                metrics = json.load(f)
        wall = epochs = None
        if os.path.isfile(log):
            with open(log) as f:
                lines = [ln.strip().split(",") for ln in f if ln.strip()]
            if len(lines) > 1:
                hdr = lines[0]
                last = dict(zip(hdr, lines[-1]))
                wall = float(last.get("wall_s", "nan"))
                epochs = int(last.get("epoch", -1)) + 1
        rows.append((fam, metrics, wall, epochs))

    lines = [
        "# Training-campaign results (one TPU v5e, bootstrap SMD dataset)",
        "",
        "Every family driver trains end-to-end (`mdx train <family>`), "
        "generates an ensemble, and scores it against the training data "
        "with the reference's e2e-along-reaction-coordinate evaluator "
        "(GAN_V12.3.1/test.py:31-55) plus radius-of-gyration statistics. "
        "`mean_abs_error` is the bucketed end-to-end-distance discrepancy "
        "in Angstrom (lower = generated ensemble matches the data's "
        "pulling pathway). `std_abs_error` in the extras column is the "
        "ensemble-*spread* mismatch (mean |std_gen - std_data| per "
        "bucket) — watch it alongside the mean: e.g. the round-3 "
        "lstm-nll retrain improved mean 1.65 -> 0.90 but regressed "
        "spread 0.82 -> 1.51, a trade-off the mean column alone hides.",
        "",
        "| family | e2e mean err (A) | e2e max err (A) | Rg err (A) | "
        "extras | train wall (s) | epochs |",
        "|---|---|---|---|---|---|---|",
    ]
    for fam, m, wall, epochs in rows:
        if not m and wall is None:
            continue
        # std_abs_error (ensemble-spread mismatch) stays in the extras
        # column so spread regressions are visible alongside mean-error
        # improvements (e.g. the r3 lstm-nll retrain: mean 1.65 -> 0.90
        # but std 0.82 -> 1.51 — a trade-off, not a pure win)
        extras = {
            k: v
            for k, v in m.items()
            if k
            not in (
                "mean_abs_error", "max_abs_error",
                "rg_gen_mean", "rg_data_mean", "rg_abs_error",
            )
        }
        fmt = lambda x: f"{x:.3f}" if isinstance(x, float) else str(x)
        lines.append(
            "| {} | {} | {} | {} | {} | {} | {} |".format(
                fam,
                fmt(m.get("mean_abs_error", "—")),
                fmt(m.get("max_abs_error", "—")),
                fmt(m.get("rg_abs_error", "—")),
                ", ".join(f"{k}={fmt(v)}" for k, v in sorted(extras.items()))
                or "—",
                f"{wall:.0f}" if wall is not None else "—",
                epochs if epochs is not None else "—",
            )
        )
    # flagship section: the full-representation cGAN on regenerated GBIS
    # campaign data — emitted from each depth-run's eval.json so the
    # table survives regeneration
    def _load_run(d, fam):
        ev = os.path.join(d, fam, "eval.json")
        if not os.path.isfile(ev):
            return None, None
        with open(ev) as f:
            m = json.load(f)
        n_ep = "—"
        log = os.path.join(d, fam, "train_log.csv")
        if os.path.isfile(log):
            with open(log) as f:
                ls = [ln.strip().split(",") for ln in f if ln.strip()]
            if len(ls) > 1:
                # phase epoch counters reset (pretrain -> GAN): the run
                # length is the max epoch seen across phases + 1
                col = ls[0].index("epoch")
                n_ep = max(int(r[col]) for r in ls[1:]) + 1
        return m, n_ep

    flagship = [
        (d, m, ep)
        for d in ("runs_r3_full", "runs_r3_full32")
        for m, ep in [_load_run(d, "cgan")]
        if m is not None
    ]
    if flagship:
        lines += [
            "",
            "## Flagship: full-representation cGAN on the regenerated "
            "GBIS campaign",
            "",
            "The reference's headline experiment trains the 104-atom "
            "full-representation physics-informed cGAN on the NAMD GBIS "
            "campaign data for 12 epochs at ~490 s/epoch on a V100 "
            "(cGAN_D_pos-2.2.4/slurm.12794887.out:13751). The TPU "
            "equivalent regenerates the campaign **in-kernel** (64 "
            "replicas x 1 ns of GB-OBC + LCPO SASA + rigid-bond Langevin "
            "SMD, `scripts/regenerate_smd.py --gbis`, 416 s device wall) "
            "and trains on it directly:",
            "",
            "| dataset | e2e mean err (A) | e2e max err (A) | Rg err (A) "
            "| epochs |",
            "|---|---|---|---|---|",
        ] + [
            "| regenerated GBIS campaign, 64 reps x 1000 frames (stride "
            "10), 104 atoms | {:.3f} | {:.3f} | {:.3f} | {} |".format(
                fm["mean_abs_error"], fm["max_abs_error"],
                fm["rg_abs_error"], full_epochs,
            )
            for _, fm, full_epochs in flagship
        ] + [
            "",
            "Reproduce: `python -m molecular_dynamics_tpu.cli train cgan "
            "--topology example:full --data "
            "'data_r3/smd_gbis/raw-traj_rep-*.npy' --stride 10 --epochs "
            "<16|32> --out-dir <runs_r3_full|runs_r3_full32>` (after "
            "`python scripts/regenerate_smd.py --gbis --replicas 64 "
            "--max-dump 64 --out data_r3/smd_gbis`). Round-2 state was "
            "2.57 A after 3 epochs; the physics-gated best-checkpoint "
            "export (lowest informed loss) carries the eval through the "
            "noisy late-GAN phase.",
        ]
    # full-representation variants of the other families on the same
    # regenerated GBIS data. runs_r5_fullfam/ is COMMITTED (checkpoints +
    # corrected eval.json via scripts/sweep_fullrep_corrector.py --write);
    # runs_r3_fullfam/ was the round-3 transient layout, kept as fallback.
    fullfam = []
    for ff_dir in ("runs_r5_fullfam", "runs_r3_fullfam"):
        if not os.path.isdir(ff_dir):
            continue
        for fam in sorted(os.listdir(ff_dir)):
            m, ep = _load_run(ff_dir, fam)
            if m is not None:
                fullfam.append((fam, m, ep))
        if fullfam:
            break
    if not fullfam:
        # the run dir is transient (its eval.jsons are not committed):
        # when it is absent, carry the measured section over verbatim so
        # regeneration is lossless. Source it from the CANONICAL document
        # (falling back to the output path), not only from `out` — a
        # regeneration to a fresh path must not drop the section.
        carried = False
        for src in ("docs/TRAINING.md", out):
            if not os.path.isfile(src):
                continue
            with open(src) as f:
                old = f.read()
            marker = "## Full-representation variants"
            if marker not in old:
                continue
            sec = old[old.index(marker):]
            # keep everything up to the next section heading or the
            # script's own global epilogue (or EOF), so prose after the
            # table survives; tolerate truncated or reshaped sections
            # instead of crashing the regeneration
            cut = len(sec)
            for stop in ("\n## ", "\nReproduce: `bash scripts/"):
                try:
                    cut = min(cut, sec.index(stop, 1))
                except ValueError:
                    pass
            sec = sec[:cut]
            # the physics-corrector paragraph is part of the script's own
            # unconditional epilogue (appended below for every layout) —
            # strip ALL copies from the carried text or each regeneration
            # would add one more (the round-4 quintuplication bug)
            corr_marker = "Physics-corrector rollouts (`MDX_ROLLOUT_CORRECT"
            try:
                sec = sec[: sec.index(corr_marker)]
            except ValueError:
                pass
            lines += ["", sec.rstrip()]
            carried = True
            break
        if not carried:
            print(
                "warning: full-representation-variants section not found "
                "in docs/TRAINING.md or the output file and "
                "runs_r3_fullfam/ is absent — section dropped",
                file=sys.stderr,
            )
    if fullfam:
        lines += [
            "",
            "## Full-representation variants (104 atoms, regenerated "
            "GBIS data)",
            "",
            "The reference trains its sequence/graph families on the "
            "40-atom backbone only; these runs train them at the full "
            "104-atom resolution on the same regenerated GBIS campaign "
            "the flagship uses (`--topology example:full --data "
            "'data_r3/smd_gbis/raw-traj_rep-*.npy' --stride 10`). "
            "Measured finding: the *time-conditioned* generators "
            "(pretrain decoder, flagship cGAN) hold their backbone-level "
            "quality at full resolution, while the *autoregressive* "
            "families degrade several-fold — with hydrogens/sidechains in "
            "the state, 1-step prediction error compounds much faster "
            "over the 1000-step rollout than on the 40-atom backbone "
            "(same recipes, incl. the unrolled fine-tune). The reference "
            "sidesteps this by never running its sequence models above "
            "backbone resolution. The TPU stack's differentiable force "
            "field adds the physics-corrector rollout "
            "(`MDX_ROLLOUT_CORRECT`, swept per family by "
            "scripts/sweep_fullrep_corrector.py) as the rescue lever; "
            "rows below are the committed runs_r5_fullfam artifacts — "
            "corrected where a corrector wins, with the uncorrected "
            "baseline noted in the corrector column:",
            "",
            "| family | corrector | e2e mean err (A) | e2e max err (A) "
            "| Rg err (A) | spread err (A) | epochs |",
            "|---|---|---|---|---|---|---|",
        ] + [
            "| {} | {} | {:.3f} | {:.3f} | {:.3f} | {} | {} |".format(
                fam, fm.get("rollout_corrector", "—"),
                fm["mean_abs_error"], fm["max_abs_error"],
                fm["rg_abs_error"],
                "{:.3f}".format(fm["std_abs_error"])
                if "std_abs_error" in fm else "—",
                ep,
            )
            for fam, fm, ep in fullfam
        ]
    lines += [
        "",
        "Physics-corrector rollouts (`MDX_ROLLOUT_CORRECT=<fire|langevin>:"
        "n[:pin[fk]]`) partially rescue the full-rep autoregressive "
        "collapse by relaxing each generated frame through the "
        "differentiable force field — a capability the reference stack "
        "does not have. Round-5 per-family sweep "
        "(scripts/sweep_fullrep_corrector.py, 24-rollout committed "
        "protocol, fresh-data retrained checkpoints): **lstm** "
        "uncorrected 4.56 A -> `langevin:10:pin` 3.25 / Rg 0.13 (the "
        "committed row; round-4's quoted 2.77 was the same rollout "
        "under the noisier 10-roll eval — protocol, not regression); "
        "the burst depth is a real optimum — 8/12/16 "
        "steps score 3.43 / 3.59 / 4.41 — and so is the pin force "
        "constant (`pin25`/`pin100`/`pin200` -> 3.91 / 3.62 / 3.63 vs "
        "the default pin50's 3.25): both corrector axes are fully swept "
        "and the committed spec sits at the joint optimum. **seq2seq** "
        "retrained on the fresh campaign recovers to 1.81 A *uncorrected* "
        "and every corrector now HURTS it (fire:8 2.68, fire:16 3.68, "
        "langevin:10:pin 3.99): once the base rollout stays on-manifold "
        "the relaxation is pure perturbation — the corrector is a rescue "
        "lever, not a universal post-process. **hnn** is a measured "
        "reject (uncorrected 10.18; every spec 10.1-10.5): its full-rep "
        "collapse is representation capacity, not manifold drift, so "
        "physics relaxation cannot cure it — spread-aware probe "
        "selection (MDX_HNN_PROBE=50) trims it 10.4 -> 9.9 (the "
        "committed row), still collapsed. **vae** likewise (9.61 -> "
        "9.18 at langevin:10:pin, within the 10-frame decode protocol's "
        "own draw noise — the committed 6.91 vs the sweep's 9.61 is the "
        "same checkpoint under a different decode key). Deeper "
        "relaxation always degrades (round-4 full-rep lstm: fire:32 "
        "5.04, langevin:20 5.4): the correction must stay a small "
        "perturbation of the predicted frame, not a re-simulation. The "
        "same lever applied to the sde generator's 8-frame windows "
        "(scripts/sweep_sde_corrector.py, committed checkpoint, fixed "
        "1024-path draw) is a measured reject on BOTH statistics: e2e "
        "is unchanged (1.888 -> 1.887 for every fire/langevin spec — "
        "sde's e2e deficit is a bucket-profile mismatch, not physical "
        "clashes) while marginal TV degrades monotonically with burst "
        "depth (0.157 -> 0.194 at langevin:10).",
        "",
        "Reproduce: `bash scripts/run_campaign.sh runs_r3 16` or per family "
        "`python -m molecular_dynamics_tpu.cli train <family> --data "
        "'datasets/backbone_smd/raw-traj_rep-*.npy' --epochs 16` (without "
        "`--data` each family bootstraps its own on-device SMD dataset). "
        "lstm-nll samples autoregressive rollouts from its Gaussian head "
        "(the reference Alpha/LSTM-NLL predict-and-emit capability). "
        "Non-default recipes behind the committed rows: flow trains 64 "
        "epochs with `MDX_FLOW_TEMB=8` (Fourier time features for the "
        "coupling conditioners; scalar conditioning plateaus at 1.69 A); "
        "aae trains 128 epochs with the conditional (supervised-AAE) "
        "decoder, latent 16, and evaluator-probed snapshot selection "
        "every 2 epochs (`MDX_AAE_PROBE=2`) — 64 epochs plateaus at "
        "1.24 A, latent 32 measured worse (1.46 A); "
        "seq2seq-graph trains 64 epochs at hidden 64 (hidden 128 measured "
        "worse, 3.97 A) followed by the unrolled fine-tune through its "
        "chained-decode + refeaturization generation map "
        "(MDX_GSEQ_FT_SEGS=4 segments; 2.49 A -> 1.01 A — the same "
        "train/generate map-mismatch cure as gat/lstm/node); "
        "hnn-schnet uses the Gaussian RBF distance "
        "expansion (`MDX_SCHNET_RBF=32` default — the reference's bare "
        "exp(-d) filter kernel is blind past a few Angstrom and scores "
        "9.06 A) at 16 epochs (32 epochs overfits the unroll phase: "
        "13.4 A, Rg blown to 19.7). Measured trade-off on node's Rg "
        "residual (the table's worst structural metric): corrector "
        "rollouts shrink Rg err but give back e2e — fire:16:pin 1.36 A "
        "e2e / 1.05 A Rg, langevin:10:pin 1.52 / 0.69, vs the committed "
        "1.07 / 1.47 — neither dominates, so the committed row stays the "
        "uncorrected rollout and the corrector knob is documented for "
        "users who weight Rg. Measured rejects: node auxiliary fine-tune "
        "losses (Rg-MSE, dist-matrix MSE) and half-length probe "
        "checkpoint selection all made e2e several-fold worse, and a "
        "round-5 retrain with spread-aware probe selection (e2e + Rg + "
        "0.5*std over full-length probe rollouts) reproduced the "
        "committed row exactly — no mid-training snapshot dominates the "
        "final params, so Rg 1.47 is a capacity property of the "
        "phase-space field, not a selection artifact. "
        "hnn-latent (PixelHNN, cuda_hnn.py:75-98 — a model the reference "
        "defines but never trains on MD data) autoencodes frames to a "
        "16-dim latent phase space and trains HNN dynamics there "
        "(recon + decoded next-frame + symmetric latent-consistency + "
        "latent-L2 losses), 32 epochs with evaluator-probed snapshot "
        "selection (MDX_LHNN_PROBE=4; the final params overfit the "
        "1-step map and probe at 2.4 — an epoch-12 snapshot generates "
        "best). Round-5 fix behind the jump from 2.03 A to 0.73: the "
        "original stop-gradient consistency term ('dynamics chases the "
        "encoder') diverges — the AE loss is invariant to affine latent "
        "reparameterization, and the one-sided chase drifts along that "
        "free direction until |z| runs away (1e6 by epoch 8; training "
        "loss 1e12 while the decoder stays locally intact, which is why "
        "the broken run still scored 2.03). Gradient clipping and a "
        "latent L2 alone do NOT stop it (under Adam only gradient "
        "direction matters); making the consistency term symmetric "
        "removes the chase and training is stable (loss 0.017). "
        "Measured rejects on the healthy model: 64 epochs (e2e 2.34, "
        "spread 1.34), latent 32 (Rg inflates to 1.53), and the "
        "latent-unroll fine-tune (MDX_LHNN_FT_*: lat16 2.08 -> 3.10). "
        "hnn-schnet's ensemble spread (std 2.32) is a measured-reject "
        "for snapshot selection: a spread-aware probe "
        "(e2e + Rg + 0.5*std, MDX_HNN_PROBE/MDX_PROBE_STD_W) scored "
        "every mid-training checkpoint worse than the final params — "
        "the spread is a training-capacity property of the filter "
        "backbone, not a late-training regression. sde's "
        "bare 32/48-epoch retrains diverge (critic collapse, all paths "
        "non-finite); evaluator-probed snapshot selection rescues the "
        "pre-collapse checkpoints (TV 0.217 -> 0.157, the committed "
        "row). The rest of the sde sweep measured worse: an "
        "empirical-Wasserstein quantile-matching aux loss "
        "(MDX_SDE_QUANTILE 1.0/3.0 -> TV 0.215 both — it stabilizes "
        "training but hurts marginals), 64 epochs (0.178), seed 1 "
        "(0.200), fresh 32-epoch retrains with 3-seed-averaged probe "
        "scoring (MDX_SDE_PROBE_SEEDS=3 -> 0.208), and Fourier "
        "time-conditioning of the drift (MDX_SDE_TEMB=8; full re-run "
        "eval: e2e 1.90 vs the committed 1.94, spread halved to 1.05, "
        "but TV 0.244 and Rg 0.26 vs 0.05 — a spread trade-off knob, "
        "not a win; two independent TEMB retrains land TV 0.244/0.256, "
        "consistent with the run-to-run band). The sde e2e deficit is "
        "thus measured unreachable by time conditioning, by the physics "
        "corrector (scripts/sweep_sde_corrector.py: e2e unchanged at "
        "1.887 for every spec), and by every capacity/epoch lever "
        "swept. The committed row's finite-sample noise band "
        "(scripts/sde_tv_noiseband.py, 8 independent 1024-path "
        "ensembles on the committed checkpoint, runs_r3/sde/"
        "tv_noiseband.json): TV 0.169 +/- 0.014 (min 0.139, max 0.184; "
        "data-vs-data floor 0.066 +/- 0.003). The single-draw 0.157 in "
        "the table is within that band; the honest expected value of "
        "the checkpoint is ~0.17, i.e. the round-3 <=0.15 target is "
        "~1.3 sigma below the mean and is NOT met in expectation — "
        "run-to-run training variance (fresh retrains land at "
        "0.21-0.26) dominates any remaining recipe lever.",
        "",
        "The evaluator buckets the end-to-end distance per trajectory by "
        "*normalized time* and compares generated rollouts bucket-by-bucket "
        "(the reference keys e2e means by frame number, "
        "GAN_V17.12/gan.py:35-56). This is stricter than a flattened/"
        "marginal comparison — numbers are not comparable to tables "
        "produced before the time-resolved evaluator (round 2).",
        "",
    ]
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({len(rows)} families)")


if __name__ == "__main__":
    main()
