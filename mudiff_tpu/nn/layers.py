"""Primitive layers: convs, dense, NIN, time embedding, PixelNorm.

Parity sources: backbones/layers.py (ddpm_conv1x1/3x3:104-128,
get_timestep_embedding:465-479, NIN:496-505), backbones/dense_layer.py
(dense:67-71, conv2d:73-80), ncsnpp PixelNorm
(backbones/ncsnpp_generator_adagn_feat.py:44-49).

All modules are NHWC and take a ``dtype`` for bf16 compute with fp32
params (``param_dtype``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mudiff_tpu.nn.initializers import default_init, stylegan_dense_init

Dtype = Any


def get_act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference backbones/layers.py:33-45)."""
    name = name.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == "swish" or name == "silu":
        return jax.nn.silu
    raise NotImplementedError(f"activation {name} does not exist")


class _GemmConv(nn.Module):
    """Param-tree-identical stand-in for the inner nn.Conv of Conv3x3
    that routes through the implicit-GEMM Pallas kernel
    (ops/pallas_conv.py).  Same param names ("kernel"/"bias"), shapes,
    inits and dtypes as nn.Conv, so checkpoints and the pinned parity
    tests are oblivious to the routing."""

    features: int
    use_bias: bool
    kernel_init: Callable
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mudiff_tpu.ops.pallas_conv import conv3x3_gemm

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias else None
        )
        return conv3x3_gemm(
            x.astype(self.dtype), kernel.astype(self.dtype), bias
        )


class _Int8Conv(nn.Module):
    """Param-tree-identical stand-in for the inner nn.Conv of Conv3x3
    that routes through the W8A8 int8 MXU path (ops/int8_conv.py).
    Same param names ("kernel"/"bias"), shapes, inits and fp32 dtypes
    as nn.Conv, so any existing checkpoint serves quantized."""

    features: int
    use_bias: bool
    kernel_init: Callable
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mudiff_tpu.ops.int8_conv import int8_conv3x3

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias else None
        )
        return int8_conv3x3(x, kernel, bias, compute_dtype=self.dtype)


class Conv3x3(nn.Module):
    """3x3 conv with DDPM init (reference layers.py:122-128)."""

    features: int
    stride: int = 1
    use_bias: bool = True
    dilation: int = 1
    init_scale: float = 1.0
    padding: Any = 1  # int or 'SAME'/'VALID'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mudiff_tpu.ops.int8_conv import int8_conv_routed, int8_enabled
        from mudiff_tpu.ops.pallas_conv import gemm_conv_routed

        if (
            self.stride == 1
            and self.dilation == 1
            and self.padding == 1
            and int8_enabled()
            and int8_conv_routed(x.shape[-1], self.features)
        ):
            return _Int8Conv(
                features=self.features,
                use_bias=self.use_bias,
                kernel_init=default_init(self.init_scale),
                dtype=self.dtype,
                name="conv",
            )(x)
        if (
            self.stride == 1
            and self.dilation == 1
            and self.padding == 1
            # per-shape routing rule from the on-chip A/B — see
            # ops/pallas_conv.gemm_conv_routed
            and gemm_conv_routed(x.shape[-1], self.features)
        ):
            return _GemmConv(
                features=self.features,
                use_bias=self.use_bias,
                kernel_init=default_init(self.init_scale),
                dtype=self.dtype,
                name="conv",
            )(x)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class Conv1x1(nn.Module):
    """1x1 conv with DDPM init (reference layers.py:104-109)."""

    features: int
    stride: int = 1
    use_bias: bool = True
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features,
            (1, 1),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class Dense(nn.Module):
    """Linear layer with the sdeflow init (reference dense_layer.py:67-71)."""

    features: int
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            kernel_init=stylegan_dense_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x)


class StyleConv2d(nn.Module):
    """Plain conv with the sdeflow init (reference dense_layer.py:73-80).

    Used by the critic; kernel_size/padding follow the reference defaults.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=stylegan_dense_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class NIN(nn.Module):
    """1x1 'network-in-network' einsum layer (reference layers.py:496-505).

    Default init_scale is 0.1, matching the reference default.
    """

    features: int
    init_scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        w = self.param("W", default_init(self.init_scale), (in_dim, self.features))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        y = jnp.einsum(
            "...c,cd->...d", x, w.astype(self.dtype)
        ) + b.astype(self.dtype)
        return y


def get_timestep_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference layers.py:465-479)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    assert emb.shape == (timesteps.shape[0], embedding_dim)
    return emb


class PixelNorm(nn.Module):
    """z-normalization for the latent mapping network
    (reference ncsnpp_generator_adagn_feat.py:44-49)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8
        )
