"""Pallas FIR kernels vs the XLA lowering (interpret mode on CPU).

The XLA path (ops/upfirdn2d.py) is the numerically-authoritative
implementation (itself validated against the reference CPU semantics);
the Pallas kernels must match it exactly, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudiff_tpu import ops
from mudiff_tpu.ops import pallas_fir

K = (1, 3, 3, 1)


@pytest.mark.parametrize(
    "shape",
    [(2, 16, 16, 128), (2, 64, 64, 128), (1, 256, 256, 64), (2, 30, 30, 32)],
)
def test_down2_matches_xla(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    ref = ops.downsample_2d(x, list(K), factor=2)
    out = pallas_fir.downsample_2d_pallas(x, K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 16, 16, 128), (2, 30, 30, 32)])
def test_up2_matches_xla(shape):
    x = jnp.asarray(np.random.RandomState(1).randn(*shape).astype(np.float32))
    ref = ops.upsample_2d(x, list(K), factor=2)
    out = pallas_fir.upsample_2d_pallas(x, K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_xla():
    x = jnp.asarray(
        np.random.RandomState(2).randn(2, 16, 16, 32).astype(np.float32)
    )
    gd_p = jax.grad(
        lambda x: jnp.sum(pallas_fir.downsample_2d_pallas(x, K) ** 2)
    )(x)
    gd_x = jax.grad(
        lambda x: jnp.sum(ops.downsample_2d(x, list(K), factor=2) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_x), atol=1e-4)
    gu_p = jax.grad(
        lambda x: jnp.sum(pallas_fir.upsample_2d_pallas(x, K) ** 2)
    )(x)
    gu_x = jax.grad(
        lambda x: jnp.sum(ops.upsample_2d(x, list(K), factor=2) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(gu_p), np.asarray(gu_x), atol=1e-4)


