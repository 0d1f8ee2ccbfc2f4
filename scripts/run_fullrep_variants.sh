#!/bin/bash
# Full-representation (104-atom) variants of the strongest model families,
# trained on the in-kernel-regenerated GBIS campaign — the same dataset the
# flagship full-rep cGAN uses. One TPU job at a time.
#
# The campaign data lives under /tmp (per-VM; regenerate with
# `python scripts/regenerate_smd.py --gbis --out <DATA_DIR>` if absent).
#
# Usage: [DATA=<glob>] [OUT=<dir>] bash scripts/run_fullrep_variants.sh \
#          [epochs] [families...]
set -u
cd "$(dirname "$0")/.."
EPOCHS=${1:-16}
shift 1 2>/dev/null || true
FAMILIES=${@:-lstm seq2seq hnn vae pretrain}
DATA=${DATA:-/tmp/data_r4/smd_gbis/raw-traj_rep-*.npy}
OUT=${OUT:-runs_r4_fullfam}

for fam in $FAMILIES; do
  echo "=== full-rep $fam $(date -u +%H:%M:%S) ==="
  timeout 3600 python -m molecular_dynamics_tpu.cli train "$fam" \
    --topology example:full \
    --data "$DATA" --stride 10 \
    --epochs "$EPOCHS" --out-dir "$OUT" \
    || echo "FAILED: $fam (exit $?)"
done
echo "=== full-rep variants done $(date -u +%H:%M:%S) ==="
