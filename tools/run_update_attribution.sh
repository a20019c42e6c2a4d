#!/bin/sh
# Sub-update attribution through the REAL bench (the only trustworthy
# timing on the tunneled backend — docs/BENCH.md). Runs the fast-mode
# default config with one sub-update stage ablated at a time.
# Usage: nohup sh tools/run_update_attribution.sh > runs/attr.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
for a in "" pht gain tail renorm "pht,gain,tail" "lin2,s1" ransac "li,hi"; do
  echo "=== EKF_ABLATE=$a"
  EKF_ABLATE="$a" timeout 2700 python bench.py
done
