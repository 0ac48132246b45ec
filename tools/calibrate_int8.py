"""Record a static int8 activation calibration for a trained checkpoint.

Runs the reverse sampler over a few validation batches with the
recording scope active (infer/calibrate.py), then writes
``int8_calib_g{1,2}.json`` sidecars next to the generator checkpoints.
Serving (infer.load_generators → test/test_volume CLIs, bench) picks
the sidecars up automatically when ``use_int8`` is on.

Usage:
  python tools/calibrate_int8.py -c experiments/phantom_flagship.yaml \
      -e flagship128 [--batches 4] [--batch-size 4] [--margin 1.0] \
      [--min-ch 128]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import yaml


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="experiments/phantom_flagship.yaml")
    ap.add_argument("-e", "--experiment", default="flagship128")
    ap.add_argument("--batches", type=int, default=4,
                    help="number of val batches to record over")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--margin", type=float, default=1.0,
                    help="absmax headroom multiplier")
    ap.add_argument("--min-ch", type=int, default=None,
                    help="routing threshold override (default: the "
                         "width-aware max(64, 2*nf))")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mudiff_tpu.cli.run import _config_from_yaml
    from mudiff_tpu.data import BRATS_ORDERS, ISLES_ORDERS, SliceDataset
    from mudiff_tpu.diffusion import PosteriorCoefficients
    from mudiff_tpu.infer.calibrate import (
        calib_sidecar_paths,
        calibrate_sampler,
        save_calib,
    )
    from mudiff_tpu.infer.slice_test import load_generators
    from mudiff_tpu.models import NCSNppGenerator

    with open(args.config) as f:
        doc = yaml.safe_load(f)
    exps = [e for e in doc["experiments"]
            if e["exp_name"] == args.experiment]
    if not exps:
        raise SystemExit(f"no experiment {args.experiment!r}")
    exp = exps[0]
    target = exp.get("target", "T1CE")
    ckpt_dir = os.path.join(doc["output_root"], exp["exp_name"], target)

    cfg = _config_from_yaml(
        dict(exp["test_args"], use_int8=True, int8_static=False),
        doc.get("data_path", "/data/BRATS"), doc["output_root"],
        exp["exp_name"], target,
    )
    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    # dynamic-mode generators record while they compute
    g1, g2, pg1, pg2 = load_generators(cfg, ckpt_dir)
    if args.min_ch is not None:
        g1 = NCSNppGenerator(config=cfg, dtype=dtype,
                             int8_min_ch=args.min_ch)
        g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype,
                             int8_min_ch=args.min_ch)

    orders = ISLES_ORDERS if cfg.dataset == "isles" else BRATS_ORDERS
    ds = SliceDataset("val", cfg.input_path, cfg.target_modality,
                      orders=orders)
    rng = np.random.RandomState(args.seed)
    sel = rng.permutation(len(ds))
    batches = []
    for i in range(args.batches):
        idx = sel[i * args.batch_size:(i + 1) * args.batch_size]
        if len(idx) == 0:
            break
        c1, c2, c3, _ = ds.gather_batch(np.sort(idx))
        batches.append((c1, c2, c3))

    post = PosteriorCoefficients.from_config(cfg)
    calib1, calib2 = calibrate_sampler(
        g1, g2, pg1, pg2, post, batches, jax.random.PRNGKey(args.seed),
        cfg.num_timesteps, cfg.nz, compute_dtype=dtype,
        min_ch=args.min_ch, margin=args.margin,
    )
    p1, p2 = calib_sidecar_paths(ckpt_dir)
    save_calib(p1, calib1)
    save_calib(p2, calib2)
    print(f"wrote {p1} ({len(calib1.sites)} sites, min_ch="
          f"{calib1.min_ch})")
    print(f"wrote {p2} ({len(calib2.sites)} sites, min_ch="
          f"{calib2.min_ch})")


if __name__ == "__main__":
    main()
