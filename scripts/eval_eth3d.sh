#!/bin/bash
# ETH3D SLAM training-sequence evaluation (groundtruth ships with the
# dataset download as groundtruth.txt).
set -e
DATASET_ROOT=${DATASET_ROOT:-datasets/eth3d}
CONFIG=${CONFIG:-config/eval_calib.yaml}
SAVE_AS=${SAVE_AS:-eth3d_eval}

for dir in "$DATASET_ROOT"/*/; do
  seq=$(basename "$dir")
  echo "=== $seq ==="
  python main.py --dataset "$dir" --config "$CONFIG" --no-viz \
    --save-as "$SAVE_AS"
  gt="$dir/groundtruth.txt"
  [ -f "$gt" ] && python scripts/compute_ate.py "$gt" \
    "logs/$SAVE_AS/$seq.txt" || true
done
