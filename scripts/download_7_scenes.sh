#!/bin/bash
# Download the 7 Microsoft 7-Scenes sequences used by the evaluation
# protocol (reference scripts/download_7_scenes.sh).
set -e
dest="datasets/7-scenes"
mkdir -p "$dest"

base="http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"
for scene in chess fire heads office pumpkin redkitchen stairs; do
  if [ -d "$dest/$scene" ]; then
    echo "$scene already present, skipping"
    continue
  fi
  echo "Downloading $scene..."
  wget -q --show-progress "$base/$scene.zip" -O "$dest/$scene.zip"
  unzip -q "$dest/$scene.zip" -d "$dest"
  # each scene ships its sequences as nested zips; the protocol uses seq-01
  unzip -q "$dest/$scene/seq-01.zip" -d "$dest/$scene"
  rm "$dest/$scene.zip"
done
