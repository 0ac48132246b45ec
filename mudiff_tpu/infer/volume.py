"""Whole-volume prediction from three NIfTI inputs.

Parity source: engine/test_volume.py — robust 1-99 percentile min-max to
[-1, 1] over nonzero voxels (:135-157), center +-slice_half_range axial
slices (:159-168), per-slice bilinear resize to image_size (:269-276),
4-step sampling, [0, 1] mapping, zero-padded volume reassembly and
NIfTI save with the original affine/header (:170-181, :292-300),
condition modality orders (:232-237).

Note the reference's documented normalization mismatch: training data is
z-scored+clamped while this path is percentile min-max — preserved as-is
(SURVEY.md §2.7).

TPU-native improvement: slices are processed in fixed-size batches
through one compiled sampler instead of one python loop launch per slice.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.diffusion import PosteriorCoefficients
from mudiff_tpu.infer.slice_test import _build_sampler, load_generators
from mudiff_tpu.utils import nifti

VOLUME_ORDERS: Dict[str, List[str]] = {
    "T1CE": ["FLAIR", "T2", "T1"],
    "FLAIR": ["T1CE", "T1", "T2"],
    "T2": ["T1CE", "T1", "FLAIR"],
    "T1": ["FLAIR", "T1CE", "T2"],
}


def robust_minmax_to_minus1_1(
    vol: np.ndarray,
    mask: Optional[np.ndarray] = None,
    pmin: float = 1.0,
    pmax: float = 99.0,
) -> np.ndarray:
    """Reference engine/test_volume.py:135-157."""
    data = vol.astype(np.float32, copy=False)
    m = (data != 0) if mask is None else (mask.astype(bool) & (data == data))
    if not np.any(m):
        return np.zeros_like(data, dtype=np.float32)
    vals = data[m]
    lo = np.percentile(vals, pmin)
    hi = np.percentile(vals, pmax)
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        lo, hi = float(vals.min()), float(vals.max())
        if hi <= lo:
            return np.zeros_like(data, dtype=np.float32)
    x01 = np.clip((data - lo) / (hi - lo), 0.0, 1.0)
    return x01 * 2.0 - 1.0


def _slice_bounds(depth: int, half_range: int) -> Tuple[int, int]:
    c = depth // 2
    return max(0, c - half_range), min(depth - 1, c + half_range)


def _bilinear_resize(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape == (size, size):
        return img.astype(np.float32)
    # antialias=False: the reference's F.interpolate(mode='bilinear',
    # align_corners=False) never low-pass-filters on downsampling
    # (engine/test_volume.py:275); jax's default antialias=True diverges
    # by up to ~0.2 on downsampled slices (tests/test_volume_parity.py).
    return np.asarray(
        jax.image.resize(
            jnp.asarray(img, jnp.float32), (size, size), method="bilinear",
            antialias=False,
        )
    )


def reconstruct_volume_from_slices(
    predicted: List[np.ndarray], ref_shape, s0: int, s1: int
) -> np.ndarray:
    """Zero-padded reassembly (reference test_volume.py:170-181)."""
    vol = np.zeros(ref_shape, dtype=np.float32)
    for i, sl in enumerate(predicted):
        z = s0 + i
        if z > s1:
            break
        if sl.shape != ref_shape[:2]:
            sl = np.asarray(
                jax.image.resize(
                    jnp.asarray(sl), tuple(ref_shape[:2]), method="bilinear",
                    antialias=False,
                )
            )
        vol[:, :, z] = sl
    return vol


def predict_volume(
    config: MuDiffConfig,
    inputs: Dict[str, str],
    output_dir: str,
    ckpt_dir: Optional[str] = None,
    slice_half_range: int = 80,
    batch_size: int = 8,
    seed: int = 42,
    generators=None,
) -> str:
    """Synthesize the target modality volume from 3 input NIfTIs.

    ``inputs`` maps modality name -> NIfTI path for the three condition
    modalities of config.target_modality (VOLUME_ORDERS).
    Returns the output NIfTI path.
    """
    order = VOLUME_ORDERS[config.target_modality]
    for m in order:
        if m not in inputs:
            raise ValueError(f"Missing required input for {m}")

    ref_shape = None
    ref_affine = None
    ref_header = None
    slices_by_mod: Dict[str, List[np.ndarray]] = {}
    s0 = s1 = 0
    for m in order:
        img = nifti.load(inputs[m])
        vol = robust_minmax_to_minus1_1(img.get_fdata())
        s0, s1 = _slice_bounds(vol.shape[2], slice_half_range)
        slices_by_mod[m] = [vol[:, :, z] for z in range(s0, s1 + 1)]
        if ref_shape is None:
            ref_shape, ref_affine, ref_header = (
                img.shape, img.affine, img.header_bytes
            )
        elif img.shape != ref_shape:
            raise ValueError(
                f"All input volumes must share shape. Got {img.shape} vs "
                f"{ref_shape} for {m}"
            )

    if generators is None:
        g1, g2, pg1, pg2 = load_generators(
            config,
            ckpt_dir
            or os.path.join(config.output_path, config.exp,
                            config.target_modality),
        )
    else:
        g1, g2, pg1, pg2 = generators
    pos_coeff = PosteriorCoefficients.from_config(config)
    sample_fn = _build_sampler(config, g1, g2, pos_coeff)

    n = len(slices_by_mod[order[0]])
    size = config.image_size
    key = jax.random.PRNGKey(seed)
    predicted: List[np.ndarray] = []
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        conds = []
        for m in order:
            batch = np.stack(
                [_bilinear_resize(slices_by_mod[m][i], size) for i in idx]
            )[..., None]
            conds.append(batch)
        pad = batch_size - len(idx)
        if pad:
            conds = [
                np.concatenate([c, np.repeat(c[-1:], pad, 0)], 0)
                for c in conds
            ]
        key, k_init, k_s = jax.random.split(key, 3)
        x_init = jax.random.normal(
            k_init, conds[0].shape, jnp.float32
        )
        fake = np.asarray(
            sample_fn(pg1, pg2, *[jnp.asarray(c) for c in conds],
                      x_init, k_s)
        )
        if pad:
            fake = fake[:-pad]
        # map to [0, 1] (reference test_volume.py:287)
        fake01 = np.clip((fake + 1.0) / 2.0, 0.0, 1.0)[..., 0]
        predicted.extend(list(fake01))

    vol_pred = reconstruct_volume_from_slices(predicted, ref_shape, s0, s1)
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(
        output_dir, f"predicted_{config.target_modality.lower()}.nii.gz"
    )
    nifti.save(vol_pred, ref_affine, out_path, header=ref_header)
    return out_path
