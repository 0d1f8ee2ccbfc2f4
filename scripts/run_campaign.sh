#!/bin/bash
# Sequential TPU training campaign over every model family.
#
# One TPU job at a time (tunnel contention); each family trains end-to-end
# (`mdx train <family>`), generates an ensemble, and writes eval.json.
# Reuses one bootstrap SMD dataset (datasets/backbone_smd) across families.
#
# Usage: bash scripts/run_campaign.sh [out_dir] [epochs] [families...]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs_r3}
EPOCHS=${2:-16}
shift 2 2>/dev/null || true
FAMILIES=${@:-pretrain cgan hnn lstm lstm-nll seq2seq seq2seq-gan lstm-gat aae flow vae transformer gat sde node}

for fam in $FAMILIES; do
  echo "=== $fam $(date -u +%H:%M:%S) ==="
  timeout 3600 python -m molecular_dynamics_tpu.cli train "$fam" \
    --data 'datasets/backbone_smd/raw-traj_rep-*.npy' \
    --epochs "$EPOCHS" --out-dir "$OUT" \
    || echo "FAILED: $fam (exit $?)"
done
echo "=== campaign done $(date -u +%H:%M:%S) ==="
python scripts/summarize_training.py "$OUT" docs/TRAINING.md
