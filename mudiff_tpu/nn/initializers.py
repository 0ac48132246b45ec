"""Weight initializers.

Two families exist in the reference:

* ``default_init`` — DDPM/JAX variance-scaling, fan_avg + uniform
  (backbones/layers.py:58-95; itself "ported from JAX", so this is a
  round trip home).  Used by all generator convs and NINs.

* ``stylegan_dense_init`` — the sdeflow dense/conv init
  (backbones/dense_layer.py:35-64).  It *claims* fan_avg but its
  ``_calculate_correct_fan`` returns fan_out for any mode != 'fan_in'
  (dense_layer.py:22-32), so the shipped behavior is fan_out + uniform
  with variance = scale/fan_out.  We reproduce the shipped behavior and
  document the quirk here.  Used by the critic's convs/denses, the z
  mapping MLP, AdaGN style layers, and ConvBlock_GAP's fc.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn.initializers import variance_scaling


def default_init(scale: float = 1.0):
    """fan_avg uniform variance scaling; scale 0 means 1e-10 (near-zero init)."""
    scale = 1e-10 if scale == 0 else scale
    return variance_scaling(scale, "fan_avg", "uniform")


def stylegan_dense_init(scale: float = 1.0):
    """fan_out uniform variance scaling (see module docstring for why
    fan_out, not fan_avg); scale 0 means 1e-10."""
    scale = 1e-10 if scale == 0 else scale
    return variance_scaling(scale, "fan_out", "uniform")
