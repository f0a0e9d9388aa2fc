#!/bin/bash
# Download the 11 EuRoC MAV sequences used by the evaluation protocol
# (reference scripts/download_euroc.sh; ASL dataset server).
set -e
dest="datasets/euroc"
mkdir -p "$dest"

base="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
seqs=(
  "vicon_room1/V1_01_easy"
  "vicon_room1/V1_02_medium"
  "vicon_room1/V1_03_difficult"
  "vicon_room2/V2_01_easy"
  "vicon_room2/V2_02_medium"
  "vicon_room2/V2_03_difficult"
  "machine_hall/MH_01_easy"
  "machine_hall/MH_02_easy"
  "machine_hall/MH_03_medium"
  "machine_hall/MH_04_difficult"
  "machine_hall/MH_05_difficult"
)

for seq in "${seqs[@]}"; do
  name=$(basename "$seq")
  if [ -d "$dest/$name" ]; then
    echo "$name already present, skipping"
    continue
  fi
  echo "Downloading $name..."
  wget -q --show-progress "$base/$seq/$name.zip" -O "$dest/$name.zip"
  unzip -q "$dest/$name.zip" -d "$dest/$name"
  rm "$dest/$name.zip"
done
