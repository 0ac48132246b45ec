"""Slice-level test harness over a preprocessed test split.

Inference is data-parallel over all visible devices: batches are sharded
over a 1-D mesh, so the same harness drives one chip or a pod slice.

Parity source: engine/test.py — checkpoint load with fallback dir
(:202-232), test-split loader (:291-300), 4-step sampling (:180-199),
per-slice jpg grids, then **global** min/max scaling across all slices
before writing pred/pred_%05d.png and gt/gt_%05d.png uint8 pairs
(:370-391) for tools/metric_calc.py.

TPU-native improvement: the reference samples at batch_size=1
(test.py:294); we batch slices (free parallelism on the MXU) — output
files and their order are identical.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.data import BRATS_ORDERS, ISLES_ORDERS, SliceDataset
from mudiff_tpu.diffusion import PosteriorCoefficients, sample_from_model
from mudiff_tpu.models import NCSNppGenerator
from mudiff_tpu.train.checkpoint import load_generator_params
from mudiff_tpu.utils.reports import save_image_grid


def _build_sampler(config: MuDiffConfig, g1, g2, pos_coeff):
    compute_dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32

    @jax.jit
    def sample_fn(pg1, pg2, c1, c2, c3, x_init, key):
        g1_fn = lambda x, a, b, c, t, z: g1.apply(
            {"params": pg1}, x, a, b, c, t, z
        )
        g2_fn = lambda x, a, b, c, t, z, ps: g2.apply(
            {"params": pg2}, x, a, b, c, t, z, pseudo_target=ps
        )
        return sample_from_model(
            pos_coeff, g1_fn, g2_fn, c1, c2, c3, x_init,
            config.num_timesteps, config.nz, key,
            compute_dtype=compute_dtype,
        )

    return sample_fn


def load_generators(
    config: MuDiffConfig,
    ckpt_dir: str,
    fallback_dir: Optional[str] = None,
):
    """Init G1/G2 and load their weights (reference test.py:202-232).

    int8 + static calibration: when ``config.use_int8`` and the
    ``int8_calib_g{1,2}.json`` sidecars exist next to the checkpoint
    (written by tools/calibrate_int8.py), the generators serve with
    static per-channel activation scales; ``config.int8_static`` forces
    the choice (True = require sidecars, False = dynamic scales).
    """
    dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32
    calib1 = calib2 = None
    if config.use_int8 and config.int8_static is not False:
        from mudiff_tpu.infer.calibrate import calib_sidecar_paths, load_calib

        p1, p2 = calib_sidecar_paths(ckpt_dir)
        if os.path.isfile(p1) and os.path.isfile(p2):
            calib1, calib2 = load_calib(p1), load_calib(p2)
        elif config.int8_static:
            raise FileNotFoundError(
                f"int8_static requires calibration sidecars {p1} / {p2} — "
                "run tools/calibrate_int8.py first"
            )
    g1 = NCSNppGenerator(config=config, dtype=dtype, int8_calib=calib1)
    g2 = NCSNppGenerator(
        config=config, adaptive=True, dtype=dtype, int8_calib=calib2
    )
    s = config.image_size
    x = jnp.zeros((1, s, s, config.num_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, config.nz), jnp.float32)
    p1_tmpl = g1.init(jax.random.PRNGKey(0), x, x, x, x, t, z)["params"]
    p2_tmpl = g2.init(
        jax.random.PRNGKey(0), x, x, x, x, t, z, pseudo_target=x
    )["params"]
    pg1 = load_generator_params(
        ckpt_dir, "gen_diffusive_1", p1_tmpl, fallback_dir
    )
    pg2 = load_generator_params(
        ckpt_dir, "gen_diffusive_2", p2_tmpl, fallback_dir
    )
    return g1, g2, pg1, pg2


def sample_and_test(
    config: MuDiffConfig,
    ckpt_dir: Optional[str] = None,
    output_dir: Optional[str] = None,
    batch_size: int = 8,
    save_grids: bool = False,
    seed: int = 42,
    generators=None,
    use_mesh: bool = True,
) -> Dict[str, str]:
    """Run the full test split; write pred/ and gt/ PNG dirs.

    ``generators`` may supply pre-loaded (g1, g2, pg1, pg2) to skip
    checkpoint loading (used by tests and the demo path).  With
    ``use_mesh`` (default) batches are sharded across all devices.
    """
    exp_dir = ckpt_dir or os.path.join(
        config.output_path, config.exp, config.target_modality
    )
    output_dir = output_dir or os.path.join(exp_dir, "generated_samples")
    os.makedirs(output_dir, exist_ok=True)
    pred_dir = os.path.join(output_dir, "pred")
    gt_dir = os.path.join(output_dir, "gt")
    os.makedirs(pred_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    mesh = None
    shard = None
    if use_mesh and len(jax.devices()) > 1:
        from mudiff_tpu.parallel import batch_sharding, make_mesh

        mesh = make_mesh(dp=-1, fsdp=1)
        n_dev = mesh.shape["data"]
        # round the batch up to a multiple of the device count
        batch_size = -(-batch_size // n_dev) * n_dev
        shard = batch_sharding(mesh)

    orders = ISLES_ORDERS if config.dataset == "isles" else BRATS_ORDERS
    ds = SliceDataset(
        "test", config.input_path, config.target_modality, orders=orders
    )
    if generators is None:
        g1, g2, pg1, pg2 = load_generators(config, exp_dir)
    else:
        g1, g2, pg1, pg2 = generators
    pos_coeff = PosteriorCoefficients.from_config(config)
    sample_fn = _build_sampler(config, g1, g2, pos_coeff)

    key = jax.random.PRNGKey(seed)
    all_pred = []
    all_gt = []
    n = len(ds)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        c1, c2, c3, target = ds.gather_batch(idx)
        # static-shape batches: pad the tail batch and trim after
        pad = batch_size - len(idx)
        if pad:
            padder = lambda a: np.concatenate(
                [a, np.repeat(a[-1:], pad, axis=0)], axis=0
            )
            c1, c2, c3, target = map(padder, (c1, c2, c3, target))
        key, k_init, k_s = jax.random.split(key, 3)
        x_init = jax.random.normal(k_init, target.shape, jnp.float32)
        dev_in = [jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(c3), x_init]
        if shard is not None:
            dev_in = [jax.device_put(a, shard) for a in dev_in]
        fake = np.asarray(
            sample_fn(pg1, pg2, dev_in[0], dev_in[1], dev_in[2],
                      dev_in[3], k_s)
        )
        if pad:
            fake, target = fake[:-pad], target[:-pad]
        all_pred.append(fake)
        all_gt.append(target[..., : fake.shape[-1]])
        if save_grids:
            save_image_grid(
                (fake + 1.0) / 2.0,
                os.path.join(output_dir, f"grid_{start:05d}.png"),
            )

    pred = np.concatenate(all_pred, axis=0)[..., 0]
    gt = np.concatenate(all_gt, axis=0)[..., 0]
    export_png_pairs(pred, gt, pred_dir, gt_dir)
    return {"pred_dir": pred_dir, "gt_dir": gt_dir, "n_slices": pred.shape[0]}


def export_png_pairs(
    pred: np.ndarray, gt: np.ndarray, pred_dir: str, gt_dir: str
) -> None:
    """Write pred_%05d.png / gt_%05d.png uint8 pairs scaled with ONE
    shared global min/max range over pred AND gt (reference
    test.py:370-391 stacks both sets before scaling) — independent
    per-set ranges would silently normalize away global intensity
    errors in the predictions and bias metric_calc optimistic."""
    from PIL import Image

    lo = min(float(pred.min()), float(gt.min()))
    hi = max(float(pred.max()), float(gt.max()))
    scale = (hi - lo) or 1.0
    for i in range(pred.shape[0]):
        p8 = np.clip((pred[i] - lo) / scale * 255.0, 0, 255).astype(np.uint8)
        g8 = np.clip((gt[i] - lo) / scale * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(p8, mode="L").save(
            os.path.join(pred_dir, f"pred_{i:05d}.png")
        )
        Image.fromarray(g8, mode="L").save(
            os.path.join(gt_dir, f"gt_{i:05d}.png")
        )
