"""LPIPS: architecture/converter validation against a torch replica."""

import numpy as np
import pytest

from mudiff_tpu.metrics.lpips import (
    LPIPS,
    load_torch_weights,
    random_params,
)


def test_identical_images_zero():
    m = LPIPS(random_params(), is_random=True)
    img = np.random.RandomState(0).rand(64, 64).astype(np.float32)
    assert m(img, img) == pytest.approx(0.0, abs=1e-6)


def test_noise_increases_distance():
    m = LPIPS(random_params(), is_random=True)
    rng = np.random.RandomState(1)
    img = rng.rand(64, 64).astype(np.float32)
    d_small = m(img, np.clip(img + 0.02 * rng.randn(64, 64), 0, 1))
    d_big = m(img, np.clip(img + 0.3 * rng.randn(64, 64), 0, 1))
    assert 0 < d_small < d_big


def test_from_env_modes(monkeypatch):
    monkeypatch.delenv("MUDIFF_LPIPS_ALEXNET", raising=False)
    monkeypatch.delenv("MUDIFF_LPIPS_RAND", raising=False)
    assert LPIPS.from_env() is None
    monkeypatch.setenv("MUDIFF_LPIPS_RAND", "1")
    m = LPIPS.from_env()
    assert m is not None and m.key == "lpips_rand"


def _torch_lpips_reference(sd_alex, sd_lin, g, p):
    """Replica of lpips.LPIPS(net='alex') forward in raw torch ops."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        taps = []
        convs = [(0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1)]
        h = (x - shift) / scale
        for i, (idx, stride, pad) in enumerate(convs):
            h = F.conv2d(
                h, sd_alex[f"features.{idx}.weight"],
                sd_alex[f"features.{idx}.bias"], stride=stride, padding=pad,
            )
            h = F.relu(h)
            taps.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, stride=2)
        return taps

    def unit(x):
        # lpips's exact normalize_tensor: eps added to the norm factor
        return x / (torch.sqrt((x ** 2).sum(1, keepdim=True)) + 1e-10)

    def to3(a):
        t = torch.from_numpy(a).unsqueeze(0).repeat(3, 1, 1).unsqueeze(0)
        return t * 2 - 1

    fa, fb = feats(to3(g)), feats(to3(p))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (unit(xa) - unit(xb)) ** 2
        w = sd_lin[f"lin{i}.model.1.weight"]  # (1,C,1,1)
        total = total + F.conv2d(d, w).mean(dim=(2, 3)).squeeze()
    return float(total)


def test_converter_matches_torch_semantics(tmp_path):
    """Random-valued checkpoints in the torchvision + lpips-package
    formats, converted and evaluated in JAX, must reproduce the torch
    forward — validating kernel transposition, padding, pooling, unit
    normalization, and the lin application."""
    import torch

    rng = np.random.RandomState(42)
    shapes = [
        (64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
        (256, 384, 3, 3), (256, 256, 3, 3),
    ]
    tv_idx = [0, 3, 6, 8, 10]
    sd_alex = {}
    for idx, s in zip(tv_idx, shapes):
        sd_alex[f"features.{idx}.weight"] = torch.tensor(
            rng.randn(*s).astype(np.float32) * 0.05
        )
        sd_alex[f"features.{idx}.bias"] = torch.tensor(
            rng.randn(s[0]).astype(np.float32) * 0.01
        )
    sd_lin = {
        f"lin{i}.model.1.weight": torch.tensor(
            rng.rand(1, shapes[i][0], 1, 1).astype(np.float32)
        )
        for i in range(5)
    }
    alex_path = str(tmp_path / "alexnet.pth")
    lin_path = str(tmp_path / "lin.pth")
    torch.save(sd_alex, alex_path)
    torch.save(sd_lin, lin_path)

    params = load_torch_weights(alex_path, lin_path)
    m = LPIPS(params)
    assert m.key == "lpips"

    g = rng.rand(64, 64).astype(np.float32)
    p = np.clip(g + 0.1 * rng.randn(64, 64).astype(np.float32), 0, 1)
    ours = m(g, p)
    ref = _torch_lpips_reference(sd_alex, sd_lin, g, p)
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-6)
