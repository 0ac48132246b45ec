#!/usr/bin/env bash
# Example: synthesize a T1CE volume from FLAIR/T2/T1 NIfTIs with a
# trained checkpoint (reference: examples_volume_prediction.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${CKPT:-./results/synthesize_T1CE/T1CE}"
OUT="${OUT:-./volume_out}"

python -m mudiff_tpu.cli.test_volume \
    --target_modality T1CE \
    --input_flair "${1:?usage: example_volume_prediction.sh flair.nii.gz t2.nii.gz t1.nii.gz}" \
    --input_t2 "${2:?}" \
    --input_t1 "${3:?}" \
    --ckpt_dir "$CKPT" \
    --output_dir "$OUT" \
    --image_size 256 --num_channels 1 --num_channels_dae 64 \
    --ch_mult 1 2 4 --num_timesteps 4

# or let the wrapper find the files by naming conventions:
#   python -m mudiff_tpu.cli.predict_volume_wrapper \
#       --patient_dir /data/patient001 --target_modality T1CE \
#       --ckpt_dir "$CKPT" --output_dir "$OUT"
