"""LPIPS (AlexNet backbone) in JAX.

Parity source: tools/metric_calc.py:23-46 of the reference, which calls
``lpips.LPIPS(net='alex')`` on 3-channel [-1,1] tensors built from [0,1]
grayscale.  The metric: AlexNet conv features tapped after each of the
five ReLUs, unit-normalized over channels, squared difference, a learned
non-negative 1x1 "lin" calibration per tap, spatial mean, summed.

Weights: this image has no torchvision/lpips checkpoints and no network
egress, so exact LPIPS values cannot be produced out of the box.  Two
modes:

* **Real LPIPS** — point ``MUDIFF_LPIPS_ALEXNET`` at a torchvision
  ``alexnet-*.pth`` state dict and ``MUDIFF_LPIPS_LIN`` at the lpips
  package's ``alex.pth`` lin checkpoint (or set the first to a full
  ``lpips.LPIPS`` state dict containing both).  ``load_torch_weights``
  converts them; values then match the reference metric.
* **Random-feature fallback** (``random_params``) — the same machinery
  over a fixed randomly-initialized AlexNet (seed 0) with uniform lin
  weights.  Random-CNN feature distances are an established perceptual
  proxy (Amir & Weiss, 2021, "Understanding and Simplifying Perceptual
  Distances"), but the values are NOT LPIPS: they are reported under
  the distinct key ``lpips_rand``.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature stack (torchvision layout): (out_ch, kernel, stride, pad)
_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# max-pool (3x3 stride 2) after taps 1 and 2
_POOL_AFTER = {0, 1}

# lpips ScalingLayer constants (input is [-1,1] RGB)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _features(params: Dict, x: jnp.ndarray):
    """x: (B,H,W,3) scaled input -> list of 5 post-ReLU feature maps."""
    taps = []
    h = x
    for i, (_, _, stride, pad) in enumerate(_CONVS):
        k = params[f"conv{i + 1}"]["kernel"]
        b = params[f"conv{i + 1}"]["bias"]
        h = jax.lax.conv_general_dilated(
            h, k, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        h = jax.nn.relu(h)
        taps.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID",
            )
    return taps


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    # Exact lpips normalize_tensor formula: eps is added to the NORM,
    # not under the sqrt (lpips/__init__.py normalize_tensor).  The
    # placement only matters for near-zero feature-norm pixels, but it
    # is what "values match the reference metric" requires.
    return x / (jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True)) + eps)


@functools.partial(jax.jit, static_argnums=())
def _distance(params: Dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a, b: (B,H,W,3) in [-1,1].  Returns (B,) LPIPS distances."""
    sa = (a - _SHIFT) / _SCALE
    sb = (b - _SHIFT) / _SCALE
    fa = _features(params, sa)
    fb = _features(params, sb)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
        w = params[f"lin{i + 1}"]  # (C,)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def random_params(seed: int = 0) -> Dict:
    """Fixed random AlexNet + uniform lin weights (``lpips_rand``)."""
    rng = jax.random.PRNGKey(seed)
    params = {}
    in_ch = 3
    for i, (out_ch, ksz, _, _) in enumerate(_CONVS):
        rng, k = jax.random.split(rng)
        fan_in = ksz * ksz * in_ch
        params[f"conv{i + 1}"] = {
            "kernel": jax.random.normal(
                k, (ksz, ksz, in_ch, out_ch), jnp.float32
            ) * np.sqrt(2.0 / fan_in),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
        params[f"lin{i + 1}"] = jnp.full((out_ch,), 1.0 / out_ch, jnp.float32)
        in_ch = out_ch
    return params


def load_torch_weights(
    alexnet_path: str, lin_path: Optional[str] = None
) -> Dict:
    """Convert torch checkpoints to our param dict.

    Accepts: a torchvision alexnet state dict (``features.N.weight``)
    plus the lpips package's lin checkpoint (``linN.model.1.weight``),
    or one combined ``lpips.LPIPS`` state dict (``net.sliceN.M.weight`` +
    ``linN.model.1.weight``).
    """
    # torch + jax in one process deadlock via OpenMP unless the thread
    # pool is bounded (CLAUDE.md); this path is reached from live-JAX
    # CLI processes when MUDIFF_LPIPS_ALEXNET is set.
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import torch

    sd = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items()}
    if lin_path:
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
        sd.update(lin_sd)

    # torchvision layout: conv indices in `features`
    tv_idx = [0, 3, 6, 8, 10]
    # lpips.LPIPS layout: net.sliceS.I — conv module indices inside each
    # sequential slice (slice1: 0, slice2: 3, slice3: 6, slice4: 8,
    # slice5: 10 — lpips keeps torchvision numbering inside slices)
    params: Dict = {}
    for i in range(5):
        w = sd.get(f"features.{tv_idx[i]}.weight")
        b = sd.get(f"features.{tv_idx[i]}.bias")
        if w is None:
            w = sd.get(f"net.slice{i + 1}.{tv_idx[i]}.weight")
            b = sd.get(f"net.slice{i + 1}.{tv_idx[i]}.bias")
        if w is None:
            raise KeyError(
                f"conv{i + 1} weights not found in {alexnet_path}"
                + (f" + {lin_path}" if lin_path else "")
            )
        params[f"conv{i + 1}"] = {
            # torch OIHW -> HWIO
            "kernel": jnp.asarray(
                np.transpose(w.numpy(), (2, 3, 1, 0)), jnp.float32
            ),
            "bias": jnp.asarray(b.numpy(), jnp.float32),
        }
        lw = sd.get(f"lin{i}.model.1.weight")
        if lw is None:
            raise KeyError(f"lin{i}.model.1.weight not found")
        params[f"lin{i + 1}"] = jnp.asarray(
            lw.numpy().reshape(-1), jnp.float32
        )
    return params


class LPIPS:
    """Pairwise LPIPS on [0,1] grayscale arrays (reference
    tools/metric_calc.py:44-46 repeats grayscale to 3 channels and maps
    to [-1,1])."""

    def __init__(self, params: Dict, is_random: bool = False):
        self.params = params
        self.is_random = is_random
        self.key = "lpips_rand" if is_random else "lpips"

    @classmethod
    def from_env(cls) -> Optional["LPIPS"]:
        """Real weights if MUDIFF_LPIPS_ALEXNET is set; random fallback
        if MUDIFF_LPIPS_RAND=1; else None (metric omitted)."""
        alex = os.environ.get("MUDIFF_LPIPS_ALEXNET")
        if alex:
            return cls(
                load_torch_weights(alex, os.environ.get("MUDIFF_LPIPS_LIN"))
            )
        if os.environ.get("MUDIFF_LPIPS_RAND") == "1":
            return cls(random_params(), is_random=True)
        return None

    def __call__(self, gt: np.ndarray, pred: np.ndarray) -> float:
        g = jnp.asarray(gt, jnp.float32)[None, ..., None] * 2.0 - 1.0
        p = jnp.asarray(pred, jnp.float32)[None, ..., None] * 2.0 - 1.0
        g = jnp.repeat(g, 3, axis=-1)
        p = jnp.repeat(p, 3, axis=-1)
        return float(_distance(self.params, g, p)[0])
