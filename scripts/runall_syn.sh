#!/bin/bash
# Run the full TensoIR-Synthetic suite (stage 0 + stage 1 + NVS eval).
set -e
for scene in lego hotdog armadillo ficus; do
  grep "^python" configs/tensoir_synthetic/$scene.txt | while read -r cmd; do
    echo "== $cmd"
    eval "$cmd"
  done
done
