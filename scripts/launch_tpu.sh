#!/usr/bin/env bash
# Launch one MU-Diff-TPU training+test job for a target modality.
#
# TPU-native replacement for the reference SLURM scripts
# (slurm_scripts/mudiff_{t1ce,flair,t2,t1}.sh): no CUDA env fixes, no
# extension pre-building, no NCCL ports — one python process per host,
# the mesh handles the rest.  On a multi-host TPU pod slice, run this
# same command on every host (e.g. via `gcloud compute tpus tpu-vm ssh
# --worker=all --command=...`); jax.distributed initializes from the TPU
# runtime environment automatically.
#
# Usage: scripts/launch_tpu.sh <T1CE|FLAIR|T2|T1> [config.yaml]
set -euo pipefail

TARGET="${1:?usage: launch_tpu.sh <T1CE|FLAIR|T2|T1> [config.yaml]}"
CFG="${2:-experiments/brats.yaml}"

cd "$(dirname "$0")/.."

python -m mudiff_tpu.cli.check_pipeline -c "$CFG"
exec python -m mudiff_tpu.cli.run -c "$CFG" -e "synthesize_${TARGET}"
