"""``python -m mudiff_tpu.cli.test_volume --...`` — whole-volume
prediction CLI (reference: python test_volume.py,
engine/test_volume.py:302-373)."""

from mudiff_tpu.cli.args import parse_config
from mudiff_tpu.infer import predict_volume
from mudiff_tpu.infer.volume import VOLUME_ORDERS


def main(argv=None) -> None:
    cfg, args = parse_config(argv, mode="test_volume")
    provided = {
        "T1CE": args.input_t1ce,
        "T1": args.input_t1,
        "T2": args.input_t2,
        "FLAIR": args.input_flair,
    }
    if cfg.target_modality not in VOLUME_ORDERS:
        raise SystemExit(
            f"Unsupported target modality: {cfg.target_modality!r}; "
            f"choose from {sorted(VOLUME_ORDERS)}"
        )
    needed = VOLUME_ORDERS[cfg.target_modality]
    inputs = {}
    for m in needed:
        if not provided.get(m):
            raise ValueError(
                f"Missing required input for {m}. Provide --input_{m.lower()}"
            )
        inputs[m] = provided[m]
    out = predict_volume(
        cfg, inputs, args.output_dir, ckpt_dir=args.ckpt_dir,
        slice_half_range=args.slice_half_range,
        batch_size=args.test_batch_size, seed=cfg.seed,
    )
    print(f"[done] saved: {out}")


if __name__ == "__main__":
    main()
