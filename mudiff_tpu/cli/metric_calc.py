"""Offline metric evaluation of pred/ vs gt/ PNG directories.

Parity source: tools/metric_calc.py (reference) — PSNR, SSIM, MAE
(+LPIPS when a scorer is available) on [0,1] grayscale pairs, averaged.

Usage: python -m mudiff_tpu.cli.metric_calc --pred_dir P --gt_dir G
"""

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("mudiff_tpu metric_calc")
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    args = ap.parse_args(argv)

    from mudiff_tpu.metrics import evaluate_pair_dirs

    print(json.dumps(evaluate_pair_dirs(args.pred_dir, args.gt_dir), indent=2))


if __name__ == "__main__":
    main()
