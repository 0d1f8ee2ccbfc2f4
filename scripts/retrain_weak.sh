#!/bin/bash
# Round-3 weak-family retrains: longer runs on the shared backbone dataset.
# Sequential — one TPU job at a time (tunnel contention, CLAUDE.md).
set -u -o pipefail
cd /root/repo
DATA='datasets/backbone_smd/raw-traj_rep-*.npy'
OUT=${1:-runs_r3}
EPOCHS=${2:-64}
for fam in gat node lstm vae aae sde seq2seq; do
  echo "=== $fam ($EPOCHS epochs) ==="
  if [ -f "$OUT/$fam/eval.json" ]; then
    cp "$OUT/$fam/eval.json" "$OUT/$fam/eval_prev.json"
    # a killed/failed run must not be mistaken for a result: the final
    # report below only shows eval.json the driver wrote THIS run
    rm "$OUT/$fam/eval.json"
  fi
  timeout 3600 python -m molecular_dynamics_tpu.cli train "$fam" \
    --data "$DATA" --epochs "$EPOCHS" --out-dir "$OUT" 2>&1 | tail -2 \
    || echo "$fam FAILED (timeout or error)"
done
for fam in gat node lstm vae aae sde seq2seq; do
  echo "--- $fam"; cat "$OUT/$fam/eval.json" 2>/dev/null
done
