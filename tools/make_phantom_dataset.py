"""Synthetic multi-contrast MRI phantom dataset generator.

Real BraTS/ISLES data is not shippable in this environment, so the
quality-parity protocol (PERFORMANCE.md) trains on phantoms that mimic
the task structure: per PATIENT a shared random anatomy (skull ellipse,
smooth tissue field, ventricles, a lesion), rendered into four
modalities by modality-specific nonlinear contrast transforms + bias
fields + noise — so translation requires combining the three condition
contrasts, like the real task.  Splits are at PATIENT level (held-out
val/test patients), matching the reference's preprocessing
(tools/pre_process.py patient splits).

Writes directly in the preprocessed layout consumed by the train/test
CLIs: {out}/{split}/{MOD}.npy float32 (N, H, W), z-scored per slice
stack like data/preprocess.normalize_volume (nonzero mean/std).

Usage:
  python tools/make_phantom_dataset.py --output_dir npy \
      --n_patients 60 --image_size 256 --slices 8 [--seed 0]
"""

import argparse
import os

import numpy as np

MODS = ["T1", "T1CE", "T2", "FLAIR"]


def _smooth_noise(rng, shape, scale):
    """Low-frequency random field: upsampled coarse noise."""
    coarse = rng.randn(*[max(2, s // scale) for s in shape]).astype(np.float32)
    try:
        from scipy.ndimage import zoom

        factors = [s / c for s, c in zip(shape, coarse.shape)]
        return zoom(coarse, factors, order=1).astype(np.float32)
    except Exception:  # pragma: no cover - scipy is in the image
        reps = [-(-s // c) for s, c in zip(shape, coarse.shape)]
        return np.kron(coarse, np.ones(reps, np.float32))[
            tuple(slice(0, s) for s in shape)
        ]


def make_patient(rng: np.random.RandomState, size: int, slices: int):
    """Return dict mod -> (slices, size, size) float32 raw intensities."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy, cx = size / 2 + rng.randn() * size * 0.02, size / 2 + rng.randn() * size * 0.02
    ry, rx = size * (0.38 + 0.04 * rng.rand()), size * (0.30 + 0.04 * rng.rand())

    # shared anatomy through depth: tissue field + ventricles + lesion
    tissue3 = _smooth_noise(rng, (slices, size, size), 32)
    detail3 = _smooth_noise(rng, (slices, size, size), 8)
    lcy = cy + rng.randn() * size * 0.12
    lcx = cx + rng.randn() * size * 0.12
    lr = size * (0.03 + 0.05 * rng.rand())
    vent_w = size * (0.05 + 0.02 * rng.rand())

    out = {m: np.zeros((slices, size, size), np.float32) for m in MODS}
    for z in range(slices):
        zfac = 1.0 - 0.3 * abs(z - slices / 2) / max(1, slices / 2)
        brain = (((yy - cy) / (ry * zfac)) ** 2
                 + ((xx - cx) / (rx * zfac)) ** 2) < 1.0
        tissue = 0.5 + 0.25 * np.tanh(tissue3[z]) + 0.08 * detail3[z]
        vent = ((np.abs(xx - cx) < vent_w)
                & (np.abs(yy - cy) < size * 0.12 * zfac))
        lesion = ((yy - lcy) ** 2 + (xx - lcx) ** 2) < (lr * zfac) ** 2
        lesion_soft = np.exp(
            -(((yy - lcy) ** 2 + (xx - lcx) ** 2) / (2 * (lr * zfac) ** 2))
        )

        # modality-specific contrast responses of the same tissue map
        t1 = 0.9 - 0.5 * tissue
        t1[vent] *= 0.35
        t1c = t1.copy()
        t1c += 0.9 * lesion_soft  # enhancing lesion rim on T1CE
        t2 = 0.25 + 0.6 * tissue
        t2[vent] = 0.95
        t2 += 0.35 * lesion_soft
        fl = 0.3 + 0.55 * tissue
        fl[vent] *= 0.25  # CSF suppressed on FLAIR
        fl += 0.8 * lesion_soft

        for name, img in (("T1", t1), ("T1CE", t1c), ("T2", t2),
                          ("FLAIR", fl)):
            bias = 1.0 + 0.15 * np.tanh(
                _smooth_noise(rng, (size, size), 64)
            )
            noisy = np.clip(img, 0, None) * bias \
                + 0.015 * rng.randn(size, size).astype(np.float32)
            noisy = np.where(brain, np.clip(noisy, 0.01, None), 0.0)
            out[name][z] = noisy.astype(np.float32)
        del lesion  # same-footprint masks are encoded in the contrasts
    return out


def zscore(stack: np.ndarray) -> np.ndarray:
    """Per-patient z-score over nonzero voxels (preprocess semantics)."""
    mask = stack != 0
    vals = stack[mask]
    mean = float(vals.mean()) if vals.size else 0.0
    std = (float(vals.std()) or 1.0) if vals.size else 1.0
    return ((stack - mean) / std).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser("make_phantom_dataset")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--n_patients", type=int, default=60)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train_ratio", type=float, default=0.7)
    ap.add_argument("--val_ratio", type=float, default=0.15)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    assert args.n_patients >= 3, "need >=1 patient per split"
    n_train = max(1, int(args.n_patients * args.train_ratio))
    n_val = max(1, int(args.n_patients * args.val_ratio))
    while n_train + n_val >= args.n_patients:
        n_train -= 1
    splits = (
        ["train"] * n_train + ["val"] * n_val
        + ["test"] * (args.n_patients - n_train - n_val)
    )

    data = {s: {m: [] for m in MODS} for s in ("train", "val", "test")}
    for p, split in enumerate(splits):
        patient = make_patient(rng, args.image_size, args.slices)
        for m in MODS:
            data[split][m].append(zscore(patient[m]))
    for split in ("train", "val", "test"):
        d = os.path.join(args.output_dir, split)
        os.makedirs(d, exist_ok=True)
        for m in MODS:
            arr = np.concatenate(data[split][m], axis=0)
            np.save(os.path.join(d, f"{m}.npy"), arr)
        n = len(data[split][MODS[0]]) * args.slices
        print(f"[phantom] {split}: {n} slices "
              f"({len(data[split][MODS[0]])} patients)")


if __name__ == "__main__":
    main()
