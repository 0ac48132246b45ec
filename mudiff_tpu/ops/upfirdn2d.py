"""upfirdn2d and the StyleGAN2 FIR resampling family, TPU-native.

The reference implements these as two hand-written CUDA kernels with
custom double-backward autograd (utils/op/upfirdn2d_kernel.cu,
utils/op/upfirdn2d.py).  On TPU the whole family maps onto a single
``lax.conv_general_dilated`` call: lhs_dilation performs the zero-insert
upsample, signed spatial padding performs the pad/crop, the depthwise
filter runs on the VPU/MXU, and window strides perform the downsample.
XLA fuses it with neighbours and differentiates it to arbitrary order for
free — no hand-written backward needed.

Numerical spec: ``upfirdn2d_native`` (reference utils/op/upfirdn2d.py:
201-242) —
  1. zero-insert upsample by ``up`` (each pixel followed by up-1 zeros),
  2. pad each spatial dim by (pad0, pad1); negative pads crop,
  3. 2-D *convolution* with ``kernel`` (correlation with the flipped
     kernel),
  4. subsample by ``down`` starting at index 0.

Layout is NHWC throughout (TPU-native; channels-last is what the
reference hacked in via torch memory_format).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = lax.conv_dimension_numbers  # alias


def setup_fir_kernel(k: Union[Sequence[float], np.ndarray]) -> np.ndarray:
    """Normalize a 1-D (separable) or 2-D FIR kernel to sum 1.

    Reference: backbones/up_or_down_sampling.py:186-193.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def _depthwise_fir(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int,
    down: int,
    pad: Tuple[int, int],
) -> jnp.ndarray:
    """Core upfirdn as one dilated depthwise convolution.  x: (N,H,W,C)."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = int(pad[0]), int(pad[1])
    # lhs_dilation yields (H-1)*up+1 samples; the reference zero-insert
    # yields H*up (i.e. up-1 trailing zeros) — fold them into the high pad.
    pad_hi = pad1 + (up - 1)
    # XLA convolution is a correlation; flipping the kernel here makes the
    # overall op a true convolution, matching the reference's
    # F.conv2d(x, flip(kernel)).
    # Precision policy: fp32 inputs (CPU tests, reference-oracle parity)
    # keep the exact fp32 HIGHEST path.  bf16 inputs — the in-model hot
    # path — run native bf16 at default precision: on TPU, XLA expands
    # feature_group_count=C into a dense block-diagonal conv, and a
    # HIGHEST pin turns that into a 6-pass fp32 matmul (measured 41.6 ms
    # for one 256² C=64 B=8 downsample vs sub-ms in bf16 —
    # tools/bench_fir.py, PERFORMANCE.md round 2).
    exact = x.dtype == jnp.float32
    cdt = jnp.float32 if exact else x.dtype
    kflip = jnp.flip(kernel, (0, 1)).astype(cdt)
    rhs = jnp.broadcast_to(kflip[:, :, None, None], (kh, kw, 1, c))
    out = lax.conv_general_dilated(
        x.astype(cdt),
        rhs,
        window_strides=(down, down),
        padding=((pad0, pad_hi), (pad0, pad_hi)),
        lhs_dilation=(up, up),
        feature_group_count=c,
        dimension_numbers=_DN(x.shape, rhs.shape, ("NHWC", "HWIO", "NHWC")),
        precision=lax.Precision.HIGHEST if exact else None,
    )
    return out.astype(x.dtype)


def upfirdn2d(
    x: jnp.ndarray,
    kernel: Union[jnp.ndarray, np.ndarray],
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Upsample-FIR-downsample on NHWC images.

    Matches ``upfirdn2d(input, kernel, up, down, pad)`` from the reference
    (utils/op/upfirdn2d.py:170-181) with NCHW->NHWC layout change.
    """
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    return _depthwise_fir(x, kernel, int(up), int(down), pad)


def upsample_2d(
    x: jnp.ndarray,
    k: Union[Sequence[float], np.ndarray] = None,
    factor: int = 2,
    gain: float = 1.0,
) -> jnp.ndarray:
    """FIR upsample by ``factor``.  Reference: up_or_down_sampling.py:200-229."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * (gain * (factor ** 2))
    p = k.shape[0] - factor
    return upfirdn2d(
        x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2)
    )


def downsample_2d(
    x: jnp.ndarray,
    k: Union[Sequence[float], np.ndarray] = None,
    factor: int = 2,
    gain: float = 1.0,
) -> jnp.ndarray:
    """FIR downsample by ``factor``.  Reference: up_or_down_sampling.py:232-262."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    k: Union[Sequence[float], np.ndarray] = None,
    factor: int = 2,
    gain: float = 1.0,
    precision=None,
) -> jnp.ndarray:
    """Fused factor-``factor`` upsample followed by a conv with ``w``.

    ``x`` is NHWC; ``w`` is HWIO (kh, kw, in, out).  Semantics match the
    reference's conv_transpose2d+FIR composition
    (up_or_down_sampling.py:77-146): the transposed conv is expressed as a
    lhs-dilated correlation, then the FIR filter (gain * factor^2) cleans
    up the zero-inserted grid.
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw_, _, _ = w.shape
    assert kh == kw_
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * (gain * (factor ** 2))
    p = (k.shape[0] - factor) - (kh - 1)

    # The reference feeds conv_transpose2d with spatially pre-flipped
    # weights (up_or_down_sampling.py:130-134); conv_transpose itself
    # flips once more, so the net op is a correlation with the *unflipped*
    # kernel over the zero-dilated input, with full (kh-1) padding.
    # (output_padding is identically 0 for the reference's output-shape
    # choice: up_or_down_sampling.py:123-126.)
    # bf16 inputs stay bf16 (fp32 operand casts double HBM traffic on
    # the hot path); fp32 inputs keep the exact fp32 path for parity.
    cdt = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    wf = w.astype(cdt)
    out = lax.conv_general_dilated(
        x.astype(cdt),
        wf,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=_DN(x.shape, wf.shape, ("NHWC", "HWIO", "NHWC")),
        precision=precision,
    ).astype(x.dtype)
    return upfirdn2d(
        out, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1)
    )


def conv_downsample_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    k: Union[Sequence[float], np.ndarray] = None,
    factor: int = 2,
    gain: float = 1.0,
    precision=None,
) -> jnp.ndarray:
    """Fused conv with ``w`` followed by factor-``factor`` downsample.

    ``x`` is NHWC; ``w`` is HWIO.  Reference: up_or_down_sampling.py:149-183.
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw_, _, _ = w.shape
    assert kh == kw_
    if k is None:
        k = [1.0] * factor
    k = setup_fir_kernel(k) * gain
    p = (k.shape[0] - factor) + (kh - 1)
    x = upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
    cdt = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    wc = w.astype(cdt)
    out = lax.conv_general_dilated(
        x.astype(cdt),
        wc,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=_DN(x.shape, wc.shape, ("NHWC", "HWIO", "NHWC")),
        precision=precision,
    )
    return out.astype(x.dtype)
