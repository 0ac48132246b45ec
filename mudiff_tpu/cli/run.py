"""YAML-driven experiment runner.

Parity source: experiments/run.py — loads a YAML with top-level
``data_path``/``output_root`` and an ``experiments`` list of
{exp_name, target, train_args, test_args}; selects one by name; injects
data_path/output_root/exp/target_modality defaults (:313-337); resolves
pretrained_dir (:341-351); runs train then test (:354-387) with
--train-only/--test-only switches; records session metadata (:197-289).

The reference spawns train.py/test.py subprocesses and exports
MUDIFF_TRAIN_*/MUDIFF_TEST_* env; here both phases run in-process (one
JAX runtime, no CUDA/nvcc autodetection needed) but the same metadata
JSON is written.

Usage: python -m mudiff_tpu.cli.run -c cfg.yaml -e synthesize_T1CE
       [--train-only | --test-only]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import subprocess
import time
from typing import Any, Dict, Optional

import yaml

from mudiff_tpu.config import MuDiffConfig

_IGNORED_KEYS = {
    # reference flags with no TPU meaning, accepted in YAML for parity
    "gpu_chose", "compute_fid", "num_proc_node", "num_process_per_node",
    "node_rank", "local_rank", "master_address", "port_num",
}


def _session_metadata() -> Dict[str, Any]:
    meta: Dict[str, Any] = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "platform": platform.platform(),
        "python": platform.python_version(),
    }
    try:
        meta["git_commit"] = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5,
        ).stdout.strip()
    except Exception:
        pass
    try:
        import jax

        meta["jax_version"] = jax.__version__
        meta["devices"] = [str(d) for d in jax.devices()]
    except Exception:
        pass
    return meta


def _config_from_yaml(
    args_dict: Dict[str, Any],
    data_path: str,
    output_root: str,
    exp_name: str,
    target: str,
) -> MuDiffConfig:
    d = {k: v for k, v in (args_dict or {}).items() if k not in _IGNORED_KEYS}
    d.setdefault("input_path", data_path)
    d.setdefault("output_path", output_root)
    d.setdefault("exp", exp_name)
    d.setdefault("target_modality", target)
    return MuDiffConfig.from_dict(d)


def run_experiment(
    cfg_path: str,
    exp_name: str,
    train_only: bool = False,
    test_only: bool = False,
    verbose: bool = True,
) -> Dict[str, Any]:
    with open(cfg_path) as f:
        doc = yaml.safe_load(f)
    experiments = doc.get("experiments", [])
    match = [e for e in experiments if e.get("exp_name") == exp_name]
    if not match:
        names = [e.get("exp_name") for e in experiments]
        raise ValueError(f"experiment {exp_name!r} not found; have {names}")
    exp = match[0]
    data_path = doc.get("data_path", "/data/BRATS")
    output_root = doc.get("output_root", "./results")
    target = exp.get("target", "T1CE")

    out_dir = os.path.join(output_root, exp_name, target)
    os.makedirs(out_dir, exist_ok=True)
    meta = _session_metadata()
    meta.update({"experiment": exp_name, "target": target,
                 "config_file": os.path.abspath(cfg_path)})
    with open(os.path.join(out_dir, "session_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)

    results: Dict[str, Any] = {"exp_dir": out_dir}
    if not test_only:
        from mudiff_tpu.train.loop import train

        train_cfg = _config_from_yaml(
            exp.get("train_args"), data_path, output_root, exp_name, target
        )
        results["train"] = train(train_cfg, verbose=verbose)
    if not train_only:
        from mudiff_tpu.infer import sample_and_test
        from mudiff_tpu.metrics import evaluate_pair_dirs

        test_cfg = _config_from_yaml(
            exp.get("test_args"), data_path, output_root, exp_name, target
        )
        out = sample_and_test(test_cfg, ckpt_dir=out_dir)
        metrics = evaluate_pair_dirs(out["pred_dir"], out["gt_dir"])
        results["test"] = {**out, "metrics": metrics}
        with open(os.path.join(out_dir, "test_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        if verbose:
            print(json.dumps(metrics, indent=2))
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("mudiff_tpu experiment runner")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-e", "--experiment", required=True)
    ap.add_argument("--train-only", action="store_true")
    ap.add_argument("--test-only", action="store_true")
    args = ap.parse_args(argv)
    run_experiment(
        args.config, args.experiment,
        train_only=args.train_only, test_only=args.test_only,
    )


if __name__ == "__main__":
    main()
