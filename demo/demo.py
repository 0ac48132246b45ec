"""Single-sample demo: synthesize one missing MRI contrast from three
observed contrasts.

Parity source: demo/demo.ipynb (reference) — loads flair/t2/t1 images,
applies robust 1-99 percentile min-max then (x-0.5)/0.5 -> [-1, 1]
(notebook cell 4), runs the 4-step mutual sampler, and saves a
side-by-side panel.  Works with random-initialized generators (structure
demo) or a trained checkpoint directory (--ckpt_dir).

Usage:
  python demo/demo.py --sample_dir demo/sample_data [--ckpt_dir ...]
  python demo/demo.py --synthetic       # no data needed, synthetic input
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def irm_minmax(img: np.ndarray) -> np.ndarray:
    """Percentile min-max to [0,1] then center to [-1,1]
    (reference demo.ipynb cell 4)."""
    img = img.astype(np.float32)
    nz = img[img != 0]
    if nz.size == 0:
        return np.zeros_like(img)
    lo, hi = np.percentile(nz, 1.0), np.percentile(nz, 99.0)
    if hi <= lo:
        lo, hi = float(img.min()), float(img.max() or 1.0)
    x = np.clip((img - lo) / (hi - lo), 0.0, 1.0)
    return (x - 0.5) / 0.5


def main() -> None:
    ap = argparse.ArgumentParser("mudiff_tpu demo")
    ap.add_argument("--sample_dir", default=None,
                    help="dir with flair/t2/t1[/t1ce] images (.jpg/.png)")
    ap.add_argument("--synthetic", action="store_true",
                    help="use synthetic phantom inputs")
    ap.add_argument("--ckpt_dir", default=None,
                    help="trained checkpoint dir (gen_diffusive_1/, _2/)")
    ap.add_argument("--target_modality", default="T1CE")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--num_channels_dae", type=int, default=64)
    ap.add_argument("--out", default="demo_output.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.diffusion import PosteriorCoefficients, sample_from_model
    from mudiff_tpu.models import NCSNppGenerator

    cfg = brats_recipe(
        image_size=args.image_size, num_channels_dae=args.num_channels_dae
    )
    s = cfg.image_size

    def load_gray(path):
        from PIL import Image

        img = Image.open(path).convert("L").resize((s, s))
        return irm_minmax(np.asarray(img, np.float32))

    if args.synthetic or not args.sample_dir:
        # concentric phantom, distinct per "contrast"
        yy, xx = np.mgrid[0:s, 0:s]
        r = np.sqrt((yy - s / 2) ** 2 + (xx - s / 2) ** 2) / (s / 2)
        conds = [
            irm_minmax(np.clip(1 - r, 0, 1) * (i + 1) * 50.0)
            for i in range(3)
        ]
        print("[demo] using synthetic phantom inputs")
    else:
        name_sets = {
            "T1CE": ("flair", "t2", "t1"),
            "FLAIR": ("t1ce", "t1", "t2"),
            "T2": ("t1ce", "t1", "flair"),
            "T1": ("flair", "t1ce", "t2"),
        }[args.target_modality.upper()]
        conds = []
        for n in name_sets:
            for ext in (".jpg", ".png", ".jpeg"):
                p = os.path.join(args.sample_dir, n + ext)
                if os.path.isfile(p):
                    conds.append(load_gray(p))
                    break
            else:
                raise FileNotFoundError(f"{n}.jpg/png in {args.sample_dir}")

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    g1 = NCSNppGenerator(config=cfg, dtype=dtype)
    g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype)
    x0 = jnp.zeros((1, s, s, 1), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    z0 = jnp.zeros((1, cfg.nz), jnp.float32)
    if args.ckpt_dir:
        from mudiff_tpu.infer.slice_test import load_generators

        g1, g2, pg1, pg2 = load_generators(cfg, args.ckpt_dir)
        print(f"[demo] loaded weights from {args.ckpt_dir}")
    else:
        pg1 = g1.init(jax.random.PRNGKey(0), x0, x0, x0, x0, t0, z0)["params"]
        pg2 = g2.init(
            jax.random.PRNGKey(1), x0, x0, x0, x0, t0, z0, pseudo_target=x0
        )["params"]
        print("[demo] random-initialized generators (structure demo)")

    post = PosteriorCoefficients.from_config(cfg)
    c = [jnp.asarray(ci[None, ..., None]) for ci in conds]
    x_init = jax.random.normal(jax.random.PRNGKey(2), (1, s, s, 1))

    @jax.jit
    def run(pg1, pg2, c1, c2, c3, x_init, key):
        g1_fn = lambda x, a, b, cc, t, z: g1.apply(
            {"params": pg1}, x, a, b, cc, t, z
        )
        g2_fn = lambda x, a, b, cc, t, z, ps: g2.apply(
            {"params": pg2}, x, a, b, cc, t, z, pseudo_target=ps
        )
        return sample_from_model(
            post, g1_fn, g2_fn, c1, c2, c3, x_init,
            cfg.num_timesteps, cfg.nz, key, compute_dtype=dtype,
        )

    fake = np.asarray(run(pg1, pg2, *c, x_init, jax.random.PRNGKey(3)))
    panel = np.concatenate(
        [np.clip((ci + 1) / 2, 0, 1) for ci in conds]
        + [np.clip((fake[0, ..., 0] + 1) / 2, 0, 1)],
        axis=1,
    )
    from PIL import Image

    out = args.out
    if out.endswith(os.sep) or os.path.isdir(out):
        # --out points at a directory: drop the default filename in it
        out = os.path.join(out, "demo_output.png")
    elif not os.path.splitext(out)[1]:
        # extension-less --out: write a PNG rather than erroring in PIL
        out += ".png"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    Image.fromarray((panel * 255).astype(np.uint8), "L").save(out)
    print(f"[demo] wrote {out} (3 conditions | synthesized "
          f"{args.target_modality})")


if __name__ == "__main__":
    main()
