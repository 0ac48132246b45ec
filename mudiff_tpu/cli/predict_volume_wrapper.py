"""Convenience wrapper: find NIfTI inputs in a patient directory by
naming conventions and run volume prediction.

Parity source: tools/predict_volume_wrapper.py (reference) — modality
filename matching (:125-138: t1ce/t1c/t1gd... patterns), YAML test_args
loading, then test_volume invocation (:169-227).  Runs in-process
instead of spawning a subprocess.

Usage:
  python -m mudiff_tpu.cli.predict_volume_wrapper \
      --patient_dir /data/patient001 --target_modality T1CE \
      --config experiments/brats.yaml --experiment synthesize_T1CE \
      --ckpt_dir results/synthesize_T1CE/T1CE --output_dir ./out
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Dict, Optional

# modality -> filename patterns, checked in order (reference :125-138)
_PATTERNS = {
    "T1CE": [r"t1ce", r"t1c(?![a-z])", r"t1gd", r"t1n?[-_]?contrast"],
    "T1": [r"t1n(?![a-z])", r"t1(?![cg0-9])", r"t1w"],
    # note: t2f / t2flair are FLAIR acquisitions (BraTS-2023 naming),
    # never plain T2
    "T2": [r"t2w", r"t2(?![a-z0-9])"],
    "FLAIR": [r"flair", r"t2f(?![a-z])"],
    "DWI": [r"dwi", r"diff"],
}


def find_modality_files(patient_dir: str) -> Dict[str, str]:
    files = [
        f for f in sorted(os.listdir(patient_dir))
        if f.lower().endswith((".nii", ".nii.gz"))
    ]
    found: Dict[str, str] = {}
    for mod, patterns in _PATTERNS.items():
        for pat in patterns:
            for f in files:
                if re.search(pat, f.lower()):
                    found[mod] = os.path.join(patient_dir, f)
                    break
            if mod in found:
                break
    return found


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("mudiff_tpu predict_volume_wrapper")
    ap.add_argument("--patient_dir", required=True)
    ap.add_argument("--target_modality", default="T1CE")
    ap.add_argument("--config", default=None,
                    help="experiment YAML supplying test_args")
    ap.add_argument("--experiment", default=None)
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--output_dir", default="./volume_out")
    ap.add_argument("--slice_half_range", type=int, default=80)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args(argv)

    from mudiff_tpu.config import MuDiffConfig, brats_recipe
    from mudiff_tpu.infer import predict_volume
    from mudiff_tpu.infer.volume import VOLUME_ORDERS

    if args.config and args.experiment:
        import yaml

        from mudiff_tpu.cli.run import _config_from_yaml

        with open(args.config) as f:
            doc = yaml.safe_load(f)
        exp = next(
            e for e in doc["experiments"]
            if e["exp_name"] == args.experiment
        )
        cfg = _config_from_yaml(
            exp.get("test_args"), doc.get("data_path", ""),
            doc.get("output_root", "."), args.experiment,
            args.target_modality,
        )
    else:
        cfg = brats_recipe(target_modality=args.target_modality)
    cfg = cfg.replace(target_modality=args.target_modality)

    found = find_modality_files(args.patient_dir)
    needed = VOLUME_ORDERS[cfg.target_modality]
    missing = [m for m in needed if m not in found]
    if missing:
        raise FileNotFoundError(
            f"could not locate {missing} in {args.patient_dir}; found "
            f"{found}"
        )
    inputs = {m: found[m] for m in needed}
    print(f"[wrapper] inputs: {inputs}")
    out = predict_volume(
        cfg, inputs, args.output_dir, ckpt_dir=args.ckpt_dir,
        slice_half_range=args.slice_half_range,
        batch_size=args.batch_size,
    )
    print(f"[done] saved: {out}")


if __name__ == "__main__":
    main()
