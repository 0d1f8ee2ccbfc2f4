#!/bin/bash
# Full-representation (104-atom) variants of the strongest model families,
# trained on the in-kernel-regenerated GBIS campaign (data_r3/smd_gbis) —
# the same dataset the flagship full-rep cGAN uses. One TPU job at a time.
#
# Usage: bash scripts/run_fullrep_variants.sh [epochs] [families...]
set -u
cd "$(dirname "$0")/.."
EPOCHS=${1:-16}
shift 1 2>/dev/null || true
FAMILIES=${@:-lstm seq2seq hnn vae pretrain}

for fam in $FAMILIES; do
  echo "=== full-rep $fam $(date -u +%H:%M:%S) ==="
  timeout 3600 python -m molecular_dynamics_tpu.cli train "$fam" \
    --topology example:full \
    --data 'data_r3/smd_gbis/raw-traj_rep-*.npy' --stride 10 \
    --epochs "$EPOCHS" --out-dir runs_r3_fullfam \
    || echo "FAILED: $fam (exit $?)"
done
echo "=== full-rep variants done $(date -u +%H:%M:%S) ==="
python scripts/summarize_training.py runs_r3 docs/TRAINING.md
