#!/bin/bash
# 7-Scenes evaluation (groundtruth TUM-format files ship with the repo
# layout under groundtruths/7-scenes in the reference protocol).
set -e
DATASET_ROOT=${DATASET_ROOT:-datasets/7-scenes}
GT_ROOT=${GT_ROOT:-groundtruths/7-scenes}
CONFIG=${CONFIG:-config/eval_calib.yaml}
SAVE_AS=${SAVE_AS:-7scenes_eval}

SEQS=(chess fire heads office pumpkin redkitchen stairs)
for seq in "${SEQS[@]}"; do
  echo "=== $seq ==="
  python main.py --dataset "$DATASET_ROOT/$seq" --config "$CONFIG" \
    --no-viz --save-as "$SAVE_AS"
  python scripts/compute_ate.py "$GT_ROOT/$seq.txt" \
    "logs/$SAVE_AS/$seq.txt" || true
done
