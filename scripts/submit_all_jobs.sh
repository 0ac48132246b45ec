#!/usr/bin/env bash
# Run all four synthesis targets sequentially (reference
# submit_all_jobs.sh submitted 4 parallel SLURM jobs; on a single TPU
# slice sequential is the simple default — parallelize across slices by
# running launch_tpu.sh per slice).
set -euo pipefail
cd "$(dirname "$0")/.."
for target in T1CE FLAIR T2 T1; do
  echo "=== synthesize_${target} ==="
  scripts/launch_tpu.sh "${target}" "${1:-experiments/brats.yaml}"
done
