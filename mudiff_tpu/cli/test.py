"""``python -m mudiff_tpu.cli.test --...`` — slice-level test CLI
(reference: python test.py, engine/test.py:400-492).  Writes pred/ and
gt/ PNG dirs and prints PSNR/SSIM/MAE over them."""

import json

from mudiff_tpu.cli.args import parse_config
from mudiff_tpu.infer import sample_and_test
from mudiff_tpu.metrics import evaluate_pair_dirs


def main(argv=None) -> None:
    cfg, args = parse_config(argv, mode="test")
    out = sample_and_test(
        cfg, ckpt_dir=args.ckpt_dir, batch_size=args.test_batch_size,
        seed=cfg.seed,
    )
    metrics = evaluate_pair_dirs(out["pred_dir"], out["gt_dir"])
    print(json.dumps({**{k: out[k] for k in ("pred_dir", "gt_dir")},
                      "n_slices": out["n_slices"], **metrics}, indent=2))


if __name__ == "__main__":
    main()
