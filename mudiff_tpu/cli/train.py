"""``python -m mudiff_tpu.cli.train --...`` — training CLI
(reference: python train.py, engine/train.py:1313-1472)."""

from mudiff_tpu.cli.args import parse_config
from mudiff_tpu.train.loop import train


def main(argv=None) -> None:
    cfg, _ = parse_config(argv, mode="train")
    train(cfg)


if __name__ == "__main__":
    main()
