#!/bin/bash
# Round-3 weak-family retrains: longer runs on the shared backbone dataset.
# Sequential — one TPU job at a time (tunnel contention, CLAUDE.md).
set -u
cd /root/repo
DATA='datasets/backbone_smd/raw-traj_rep-*.npy'
OUT=${1:-runs_r3}
EPOCHS=${2:-64}
for fam in gat node lstm vae aae sde seq2seq; do
  echo "=== $fam ($EPOCHS epochs) ==="
  [ -f "$OUT/$fam/eval.json" ] && cp "$OUT/$fam/eval.json" "$OUT/$fam/eval_prev.json"
  timeout 3600 python -m molecular_dynamics_tpu.cli train "$fam" \
    --data "$DATA" --epochs "$EPOCHS" --out-dir "$OUT" 2>&1 | tail -2
done
for fam in gat node lstm vae aae sde seq2seq; do
  echo "--- $fam"; cat "$OUT/$fam/eval.json" 2>/dev/null
done
