"""NCSN++ building blocks: AdaGN, BigGAN resblocks, attention, resampling.

Parity source: backbones/layerspp.py (AdaptiveGroupNorm:37-54,
AttnBlockpp:98-137, Upsample/Downsample:141-210, resblocks:213-391,
condition encoders:394-501) and backbones/up_or_down_sampling.py
(Conv2d:28-61, naive resample:64-74).

Everything is NHWC; ``dtype`` is the compute dtype (bf16 on TPU),
parameters stay fp32.  GroupNorm statistics are always computed in fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu import ops
from mudiff_tpu.nn.initializers import default_init, stylegan_dense_init
from mudiff_tpu.nn.layers import NIN, Conv1x1, Conv3x3, Dense

Dtype = Any
Act = Callable[[jnp.ndarray], jnp.ndarray]


def _num_groups(channels: int) -> int:
    return min(channels // 4, 32)


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample (reference up_or_down_sampling.py:64-68)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Box-mean downsample (reference up_or_down_sampling.py:71-74)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))


class PlainGroupNorm(nn.Module):
    """Non-affine GroupNorm, groups = min(C//4, 32), eps 1e-6
    (reference layerspp.py:56-65).

    IO stays in the compute dtype; flax computes the statistics in fp32
    internally (force_float32_reductions), so this is numerically safe
    in bf16 without the 5x cost of materializing fp32 copies.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        return nn.GroupNorm(
            num_groups=_num_groups(c),
            epsilon=1e-6,
            use_bias=False,
            use_scale=False,
            dtype=x.dtype,
        )(x)


class AffineGroupNorm(nn.Module):
    """Affine GroupNorm with configurable groups (torch nn.GroupNorm
    default affine=True), fp32 statistics."""

    num_groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=1e-6,
            use_bias=True,
            use_scale=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class AdaptiveGroupNorm(nn.Module):
    """GroupNorm modulated by a style vector: dense(style) -> (gamma, beta)
    with bias initialized to gamma=1, beta=0 (reference layerspp.py:37-54).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]

        def _style_bias(key, shape, dtype=jnp.float32):
            return jnp.concatenate(
                [jnp.ones((c,), dtype), jnp.zeros((c,), dtype)]
            )

        gb = nn.Dense(
            2 * c,
            kernel_init=stylegan_dense_init(1.0),
            bias_init=_style_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="style",
        )(style)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        h = nn.GroupNorm(
            num_groups=_num_groups(c),
            epsilon=1e-6,
            use_bias=False,
            use_scale=False,
            dtype=self.dtype,
        )(x)
        return gamma[:, None, None, :] * h + beta[:, None, None, :]


class GaussianFourierProjection(nn.Module):
    """Frozen random Fourier time embedding (reference layerspp.py:68-77)."""

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)
        x_proj = x[:, None] * w[None, :] * 2 * np.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
    """1x1-conv + cat/sum skip combiner (reference layerspp.py:80-95)."""

    features: int
    method: str = "cat"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        h = Conv1x1(self.features, dtype=self.dtype, name="Conv_0")(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


def _attn_impl() -> str:
    """Attention lowering, selected at TRACE time (jit caches per trace,
    so flip the env only when building a fresh jitted closure —
    bench.py/tools rebuild per run, same contract as MUDIFF_GEMM_CONV).

    * ``einsum`` (default): fp32 scores + fp32 softmax — the exact-parity
      path (reference layerspp.py:116-124 computes fp32 throughout).
    * ``bf16``: scores materialize as bf16 (fp32 MXU accumulation), the
      softmax runs with fp32 internals fused around the bf16 buffers —
      halves the [B,HW,HW] HBM traffic, the attention cost driver at
      64^2 (2.1 GB of fp32 scores at B=32).
    * ``flash``: blockwise Pallas kernel (never materializes the score
      matrix); TPU only — on the CPU backend it falls back to the exact
      einsum so the test suite stays hardware-independent.
    """
    import os

    return os.environ.get("MUDIFF_ATTN", "einsum")


class AttnBlockpp(nn.Module):
    """Full spatial self-attention with NIN q/k/v and skip rescale
    (reference layerspp.py:98-137).

    Scores are computed in fp32 for softmax stability; the einsum
    formulation lets XLA tile both (HW x HW) matmuls onto the MXU.
    ``MUDIFF_ATTN`` selects cheaper score lowerings (see _attn_impl);
    the param tree is identical for all of them.
    """

    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = AffineGroupNorm(_num_groups(c), dtype=self.dtype, name="GroupNorm_0")(x)
        q = NIN(c, dtype=self.dtype, name="NIN_0")(h)
        k = NIN(c, dtype=self.dtype, name="NIN_1")(h)
        v = NIN(c, dtype=self.dtype, name="NIN_2")(h)

        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        impl = _attn_impl()
        if impl == "flash" and jax.default_backend() == "cpu":
            impl = "einsum"
        if impl == "flash":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            h = flash_attention(
                q[:, None], k[:, None], v[:, None],
                sm_scale=float(int(c) ** (-0.5)),
            )[:, 0].astype(self.dtype)
        elif impl == "bf16":
            scores = jnp.einsum(
                "bqc,bkc->bqk", q, k, preferred_element_type=jnp.bfloat16
            ) * jnp.bfloat16(int(c) ** (-0.5))
            w = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
            h = jnp.einsum(
                "bqk,bkc->bqc", w, v, preferred_element_type=jnp.float32
            ).astype(self.dtype)
        else:
            scores = jnp.einsum(
                "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
            ) * (int(c) ** (-0.5))
            w = jax.nn.softmax(scores, axis=-1)
            h = jnp.einsum(
                "bqk,bkc->bqc", w.astype(self.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        h = h.reshape(b, hh, ww, c)
        h = NIN(c, init_scale=self.init_scale, dtype=self.dtype, name="NIN_3")(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0).astype(np.float32)


class FIRConv2d(nn.Module):
    """Conv2d with fused FIR up/downsampling (StyleGAN2)
    (reference up_or_down_sampling.py:28-61).

    Kernel is stored HWIO; ``kernel_init`` defaults to zeros like the
    reference ctor, but every call site passes default_init().
    """

    features: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert not (self.up and self.down)
        assert self.kernel >= 1 and self.kernel % 2 == 1
        in_ch = x.shape[-1]
        init = self.kernel_init or nn.initializers.zeros
        w = self.param(
            "weight", init, (self.kernel, self.kernel, in_ch, self.features)
        ).astype(self.dtype)
        if self.up:
            h = ops.upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            h = ops.conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            h = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1, 1),
                padding=[(self.kernel // 2,) * 2] * 2,
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
                ),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            h = h + b.astype(self.dtype)
        return h


class Upsample(nn.Module):
    """Resolution x2 (reference layerspp.py:141-173)."""

    features: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.features or x.shape[-1]
        if not self.fir:
            h = naive_upsample_2d(x, 2)
            if self.with_conv:
                h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        else:
            if not self.with_conv:
                h = ops.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = FIRConv2d(
                    out_ch,
                    kernel=3,
                    up=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True,
                    kernel_init=default_init(),
                    dtype=self.dtype,
                    name="Conv2d_0",
                )(x)
        return h


class Downsample(nn.Module):
    """Resolution /2 (reference layerspp.py:176-210)."""

    features: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.features or x.shape[-1]
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = Conv3x3(
                    out_ch, stride=2, padding=0, dtype=self.dtype, name="Conv_0"
                )(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = ops.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                x = FIRConv2d(
                    out_ch,
                    kernel=3,
                    down=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True,
                    kernel_init=default_init(),
                    dtype=self.dtype,
                    name="Conv2d_0",
                )(x)
        return x


class _TembBias(nn.Module):
    """Dense(temb) bias head used inside resblocks — default_init weights,
    zero bias (reference layerspp.py:276-279)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, temb: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            kernel_init=default_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(temb)


class ResnetBlockBigGANppAdagn(nn.Module):
    """The workhorse BigGAN-style AdaGN resblock
    (reference layerspp.py:261-324)."""

    act: Act
    features: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        zemb: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.features or in_ch
        h = self.act(
            AdaptiveGroupNorm(dtype=self.dtype, name="GroupNorm_0")(x, zemb)
        )
        if self.up:
            if self.fir:
                h = ops.upsample_2d(h, self.fir_kernel, factor=2)
                x = ops.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_upsample_2d(h, 2)
                x = naive_upsample_2d(x, 2)
        elif self.down:
            if self.fir:
                h = ops.downsample_2d(h, self.fir_kernel, factor=2)
                x = ops.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_downsample_2d(h, 2)
                x = naive_downsample_2d(x, 2)
        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + _TembBias(out_ch, dtype=self.dtype, name="Dense_0")(
                self.act(temb)
            )[:, None, None, :]
        h = self.act(
            AdaptiveGroupNorm(dtype=self.dtype, name="GroupNorm_1")(h, zemb)
        )
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(
            out_ch, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1"
        )(h)
        if in_ch != out_ch or self.up or self.down:
            x = Conv1x1(out_ch, dtype=self.dtype, name="Conv_2")(x)
        if not self.skip_rescale:
            return x + h
        return ((x + h) / np.sqrt(2.0)).astype(h.dtype)


class ResnetBlockBigGANppAdagnOne(nn.Module):
    """Variant whose second norm is a plain GroupNorm
    (reference layerspp.py:327-391; resblock_type='biggan_oneadagn')."""

    act: Act
    features: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        zemb: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.features or in_ch
        h = self.act(
            AdaptiveGroupNorm(dtype=self.dtype, name="GroupNorm_0")(x, zemb)
        )
        if self.up:
            h = ops.upsample_2d(h, self.fir_kernel, factor=2) if self.fir else naive_upsample_2d(h, 2)
            x = ops.upsample_2d(x, self.fir_kernel, factor=2) if self.fir else naive_upsample_2d(x, 2)
        elif self.down:
            h = ops.downsample_2d(h, self.fir_kernel, factor=2) if self.fir else naive_downsample_2d(h, 2)
            x = ops.downsample_2d(x, self.fir_kernel, factor=2) if self.fir else naive_downsample_2d(x, 2)
        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + _TembBias(out_ch, dtype=self.dtype, name="Dense_0")(
                self.act(temb)
            )[:, None, None, :]
        h = self.act(
            AffineGroupNorm(
                _num_groups(out_ch), dtype=self.dtype, name="GroupNorm_1"
            )(h)
        )
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(
            out_ch, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1"
        )(h)
        if in_ch != out_ch or self.up or self.down:
            x = Conv1x1(out_ch, dtype=self.dtype, name="Conv_2")(x)
        if not self.skip_rescale:
            return x + h
        return ((x + h) / np.sqrt(2.0)).astype(h.dtype)


class ResnetBlockDDPMppAdagn(nn.Module):
    """DDPM-style AdaGN resblock (reference layerspp.py:213-258)."""

    act: Act
    features: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        zemb: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.features or in_ch
        h = self.act(
            AdaptiveGroupNorm(dtype=self.dtype, name="GroupNorm_0")(x, zemb)
        )
        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + _TembBias(out_ch, dtype=self.dtype, name="Dense_0")(
                self.act(temb)
            )[:, None, None, :]
        h = self.act(
            AdaptiveGroupNorm(dtype=self.dtype, name="GroupNorm_1")(h, zemb)
        )
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(
            out_ch, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1"
        )(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = Conv3x3(out_ch, dtype=self.dtype, name="Conv_2")(x)
            else:
                x = NIN(out_ch, dtype=self.dtype, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return ((x + h) / np.sqrt(2.0)).astype(h.dtype)


class ConvFeatBlock(nn.Module):
    """Condition-image encoder: conv - GN - act - conv
    (reference layerspp.py:394-423)."""

    act: Act
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv3x3(self.features, dtype=self.dtype, name="conv1")(x)
        h = PlainGroupNorm(name="group_norm")(h)
        h = self.act(h)
        return Conv3x3(self.features, dtype=self.dtype, name="conv2")(h)


class ConvBlock(nn.Module):
    """Style-modulated condition encoder: conv - AdaGN(style) - act - conv
    (reference layerspp.py:426-455)."""

    act: Act
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        h = Conv3x3(self.features, dtype=self.dtype, name="conv1")(x)
        h = AdaptiveGroupNorm(dtype=self.dtype, name="group_norm")(h, style)
        h = self.act(h)
        return Conv3x3(self.features, dtype=self.dtype, name="conv2")(h)


class ConvBlockGAP(nn.Module):
    """Image -> style-vector embedder: encoder + global-average-pool +
    dense (reference layerspp.py:458-501)."""

    act: Act
    features: int
    zemb_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv3x3(self.features, dtype=self.dtype, name="conv1")(x)
        h = PlainGroupNorm(name="group_norm")(h)
        h = self.act(h)
        h = Conv3x3(self.features, dtype=self.dtype, name="conv2")(h)
        h = jnp.mean(h, axis=(1, 2))
        return Dense(self.zemb_dim, dtype=self.dtype, name="fc")(h)
