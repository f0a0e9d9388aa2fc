#!/bin/bash
# Download the TUM RGB-D fr1 sequences used by the evaluation protocol.
set -e
mkdir -p datasets/tum
cd datasets/tum
for seq in rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk \
           rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor \
           rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room \
           rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy \
           rgbd_dataset_freiburg1_xyz; do
  if [ ! -d "$seq" ]; then
    wget -q --show-progress \
      "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/${seq}.tgz"
    tar -xzf "${seq}.tgz" && rm "${seq}.tgz"
  fi
done
