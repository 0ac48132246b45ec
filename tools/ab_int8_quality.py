"""A/B the W8A8 int8 serving mode against exact bf16 on a trained run.

Drives the SAME test path as the run CLI (`infer.sample_and_test` +
`metrics.evaluate_pair_dirs`) twice over one checkpoint — once exact,
once with ``use_int8`` — into separate output dirs, and prints both
metric rows plus the wall-clock of the sampling pass.  This is the
quality-parity evidence for the serving mode (PERFORMANCE.md "int8
serving"): the reference has no quantized path, so the bar is
self-parity with the bf16 checkpoint, not a reference number.

Usage:
  python tools/ab_int8_quality.py -c experiments/phantom_flagship.yaml \
      -e flagship128 [--out /tmp/int8_ab]     # or -e all
"""

from __future__ import annotations

import argparse
import json
import os
import time

import yaml


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="experiments/phantom_flagship.yaml")
    ap.add_argument("-e", "--experiment", default="flagship128")
    ap.add_argument("--out", default="/tmp/int8_ab")
    ap.add_argument("--static", action="store_true",
                    help="add the int8-static leg (calibrated scales; "
                         "run tools/calibrate_int8.py first so the "
                         "int8_calib_g{1,2}.json sidecars exist)")
    ap.add_argument("--modes", default=None,
                    help="comma list from {bf16,int8,int8-static} — "
                         "overrides the --static-derived default; each "
                         "remote compile costs ~10 min, so trim legs "
                         "when pairing runs across MUDIFF_ATTN settings")
    args = ap.parse_args()

    from mudiff_tpu.cli.run import _config_from_yaml
    from mudiff_tpu.infer import sample_and_test
    from mudiff_tpu.metrics import evaluate_pair_dirs

    with open(args.config) as f:
        doc = yaml.safe_load(f)
    if args.experiment == "all":
        exps = doc["experiments"]
    else:
        exps = [e for e in doc["experiments"]
                if e["exp_name"] == args.experiment]
        if not exps:
            raise SystemExit(f"no experiment {args.experiment!r}")

    for exp in exps:
        name = exp["exp_name"]
        target = exp.get("target", "T1CE")
        ckpt_dir = os.path.join(doc["output_root"], name, target)
        rows = {}
        if args.modes:
            modes = tuple(m.strip() for m in args.modes.split(","))
            bad = set(modes) - {"bf16", "int8", "int8-static"}
            if bad:
                raise SystemExit(f"unknown modes: {sorted(bad)}")
        else:
            modes = ("bf16", "int8", "int8-static") if args.static else (
                "bf16", "int8")
        for mode in modes:
            cfg = _config_from_yaml(
                dict(exp["test_args"], use_int8=mode.startswith("int8"),
                     int8_static=(mode == "int8-static")),
                doc.get("data_path", "/data/BRATS"), doc["output_root"],
                name, target,
            )
            out_dir = os.path.join(args.out, name, mode)
            t0 = time.time()
            out = sample_and_test(cfg, ckpt_dir=ckpt_dir, output_dir=out_dir)
            wall = time.time() - t0
            metrics = evaluate_pair_dirs(out["pred_dir"], out["gt_dir"])
            rows[mode] = {**metrics, "sample_and_test_s": round(wall, 1)}
            print(name, mode, json.dumps(rows[mode]), flush=True)
        print(json.dumps({"experiment": name, "target": target,
                          "ab": rows}), flush=True)


if __name__ == "__main__":
    main()
