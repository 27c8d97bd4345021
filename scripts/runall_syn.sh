#!/bin/bash
# Run a full dataset suite (stage 0 + stage 1 + NVS eval + relight sweeps).
# Usage: scripts/runall_syn.sh [tensoir_synthetic|nerf_synthetic|OWL]
set -e
suite="${1:-tensoir_synthetic}"
case "$suite" in
  tensoir_synthetic) scenes="lego hotdog armadillo ficus" ;;
  nerf_synthetic)    scenes="lego hotdog ficus mic" ;;
  OWL)               scenes="antman gamepad mug tpiece" ;;
  *) echo "unknown suite: $suite" >&2; exit 1 ;;
esac
for scene in $scenes; do
  grep "^python" "configs/$suite/$scene.txt" | while read -r cmd; do
    echo "== $cmd"
    eval "$cmd"
  done
done
