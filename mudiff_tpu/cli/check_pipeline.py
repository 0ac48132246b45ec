"""Static pre-flight validation of an experiment setup.

Parity source: check_pipeline.py (reference root, :24-271) — verify
required files/dirs exist, YAML experiments are complete, data paths
resolve, and the python deps import — before burning queue time.
The DDP-specific checks (2-GPU config, port uniqueness) become TPU
checks (device visibility, mesh divisibility).
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
from typing import List

REQUIRED_TRAIN_KEYS = (
    "image_size", "num_channels", "num_channels_dae", "ch_mult",
    "num_res_blocks", "num_timesteps", "batch_size", "num_epoch",
    "lr_g", "lr_d", "target_modality",
)


def check(cfg_path: str, data_required: bool = False) -> List[str]:
    errors: List[str] = []
    ok = lambda msg: print(f"  [OK] {msg}")

    # deps
    for dep in ("jax", "flax", "optax", "orbax.checkpoint", "yaml", "PIL",
                "scipy", "matplotlib"):
        try:
            importlib.import_module(dep)
            ok(f"import {dep}")
        except ImportError as e:
            errors.append(f"missing dependency {dep}: {e}")

    # devices / mesh
    try:
        import jax

        n = len(jax.devices())
        ok(f"{n} accelerator device(s) visible")
    except Exception as e:
        errors.append(f"jax.devices() failed: {e}")

    # YAML structure
    if not os.path.isfile(cfg_path):
        errors.append(f"config file not found: {cfg_path}")
        return errors
    import yaml

    with open(cfg_path) as f:
        doc = yaml.safe_load(f)
    exps = doc.get("experiments") or []
    if not exps:
        errors.append("no experiments in config")
    names = [e.get("exp_name") for e in exps]
    if len(set(names)) != len(names):
        errors.append(f"duplicate experiment names: {names}")
    for e in exps:
        name = e.get("exp_name", "<unnamed>")
        ta = e.get("train_args") or {}
        # run.py injects target_modality from the experiment-level
        # ``target`` key (cli/run.py:_config_from_yaml), so either
        # spelling satisfies the static check.
        missing = [k for k in REQUIRED_TRAIN_KEYS
                   if k not in ta
                   and not (k == "target_modality" and e.get("target"))]
        if missing:
            errors.append(f"{name}: train_args missing {missing}")
        else:
            ok(f"experiment {name}: train_args complete")
        if "test_args" not in e:
            errors.append(f"{name}: no test_args")

    # data path
    data_path = doc.get("data_path")
    if data_path and os.path.isdir(data_path):
        for split in ("train", "val", "test"):
            d = os.path.join(data_path, split)
            if os.path.isdir(d):
                ok(f"data split present: {d}")
            else:
                errors.append(f"missing data split dir: {d}")
    elif data_required:
        errors.append(f"data_path not found: {data_path}")
    else:
        print(f"  [SKIP] data_path not present locally: {data_path}")

    return errors


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("mudiff_tpu pipeline pre-flight check")
    ap.add_argument("-c", "--config", default="experiments/brats.yaml")
    ap.add_argument("--require-data", action="store_true")
    args = ap.parse_args(argv)
    print(f"Checking {args.config} ...")
    errors = check(args.config, data_required=args.require_data)
    if errors:
        print("\nFAILURES:")
        for e in errors:
            print(f"  [FAIL] {e}")
        sys.exit(1)
    print("\nAll checks passed.")


if __name__ == "__main__":
    main()
