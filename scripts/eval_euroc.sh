#!/bin/bash
# EuRoC MAV evaluation (always undistorted; groundtruths/euroc/*.txt in
# the reference protocol layout).
set -e
DATASET_ROOT=${DATASET_ROOT:-datasets/euroc}
GT_ROOT=${GT_ROOT:-groundtruths/euroc}
CONFIG=${CONFIG:-config/eval_no_calib.yaml}
SAVE_AS=${SAVE_AS:-euroc_eval}

SEQS=(MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult \
      V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium \
      V2_03_difficult)
for seq in "${SEQS[@]}"; do
  echo "=== $seq ==="
  python main.py --dataset "$DATASET_ROOT/$seq" --config "$CONFIG" \
    --no-viz --save-as "$SAVE_AS"
  python scripts/compute_ate.py "$GT_ROOT/$seq.txt" \
    "logs/$SAVE_AS/$seq.txt" || true
done
