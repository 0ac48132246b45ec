"""Fused bias + leaky-ReLU.

The reference ships a dedicated CUDA kernel + double-backward autograd
Function for this (utils/op/fused_bias_act_kernel.cu, utils/op/
fused_act.py) — and then never calls it from any model (capability-parity
quirk noted in SURVEY.md §2.1).  On TPU it is a one-line jnp expression
that XLA fuses into the surrounding program; arbitrary-order gradients
come from autodiff.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jnp.ndarray:
    """leaky_relu(x + bias) * scale, bias broadcast over the channel axis.

    Matches the reference CPU fallback semantics (utils/op/fused_act.py:
    112-123) with NHWC layout: bias has shape (C,) and broadcasts over the
    trailing channel dim.
    """
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * jnp.asarray(
        scale, dtype=x.dtype
    )
