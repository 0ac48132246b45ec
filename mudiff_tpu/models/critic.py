"""Time-conditional critics (StyleGAN2-flavoured discriminators).

Parity source: backbones/discriminator.py — TimestepEmbedding:20-37,
DownConvBlock:39-99, Discriminator_small:101-172,
Discriminator_large:175-263.  The large critic returns
``(logit, mid_feat)`` where mid_feat is the activation after its third
block (32x downsampled, ngf*8 channels), used by the training loop to
build uncertainty/attention masks.

All convs/denses use the sdeflow fan_out-uniform init
(see mudiff_tpu.nn.initializers.stylegan_dense_init).
Layout NHWC; compute dtype configurable.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu import ops
from mudiff_tpu.nn.layers import Dense, StyleConv2d, get_timestep_embedding

Dtype = Any


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class TimestepEmbedding(nn.Module):
    """sinusoidal -> dense -> act -> dense (reference discriminator.py:20-37)."""

    embedding_dim: int
    hidden_dim: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        temb = get_timestep_embedding(t, self.embedding_dim)
        temb = Dense(self.hidden_dim, dtype=self.dtype, name="fc0")(
            temb.astype(self.dtype)
        )
        temb = _lrelu(temb)
        return Dense(self.output_dim, dtype=self.dtype, name="fc1")(temb)


class DownConvBlock(nn.Module):
    """act->conv->+t-bias->act->[FIR down both paths]->conv(init 0)->
    (out+skip)/sqrt(2) (reference discriminator.py:39-99)."""

    features: int
    downsample: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        out = _lrelu(x)
        out = StyleConv2d(self.features, dtype=self.dtype, name="conv1")(out)
        out = out + Dense(self.features, dtype=self.dtype, name="dense_t1")(
            t_emb
        )[:, None, None, :]
        out = _lrelu(out)
        skip_in = x
        if self.downsample:
            out = ops.downsample_2d(out, self.fir_kernel, factor=2)
            skip_in = ops.downsample_2d(x, self.fir_kernel, factor=2)
        out = StyleConv2d(
            self.features, init_scale=0.0, dtype=self.dtype, name="conv2"
        )(out)
        skip = StyleConv2d(
            self.features, kernel_size=(1, 1), padding=0, use_bias=False,
            dtype=self.dtype, name="skip",
        )(skip_in)
        return ((out + skip) / np.sqrt(2.0)).astype(out.dtype)


def _minibatch_stddev(out: jnp.ndarray, stddev_group: int = 4) -> jnp.ndarray:
    """StyleGAN2 minibatch-stddev feature, replicating the reference's
    strided grouping exactly (discriminator.py:246-254): the batch is
    viewed as (group, B//group, ...) with the *group index slowest*, the
    variance is taken across the group axis, averaged over C,H,W per
    residual index, then tiled back group-major.
    """
    b, h, w, c = out.shape
    group = min(b, stddev_group)
    # torch's view(group, -1, ...) requires b % group == 0 and would
    # crash otherwise; under SPMD the critic sees the GLOBAL batch, so
    # fall back to the largest divisor of b (identical results whenever
    # the reference's own constraint holds).
    while b % group:
        group -= 1
    m = b // group
    x5 = out.reshape(group, m, h, w, c).astype(jnp.float32)
    var = jnp.var(x5, axis=0)  # (m, h, w, c), biased
    stddev = jnp.sqrt(var + 1e-8)
    s = jnp.mean(stddev, axis=(1, 2, 3))  # (m,)
    s = jnp.tile(s, group)  # (b,) group-major, matching torch repeat
    s = s[:, None, None, None] * jnp.ones((b, h, w, 1), jnp.float32)
    return jnp.concatenate([out, s.astype(out.dtype)], axis=-1)


class DiscriminatorLarge(nn.Module):
    """256^2-scale critic; returns (logit, mid_feat)
    (reference discriminator.py:175-263)."""

    ngf: int = 32
    t_emb_dim: int = 128
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dt = self.dtype
        ngf = self.ngf
        t_embed = _lrelu(
            TimestepEmbedding(
                self.t_emb_dim, self.t_emb_dim, self.t_emb_dim, dtype=dt,
                name="t_embed",
            )(t)
        )
        h = jnp.concatenate([x.astype(dt), x_t.astype(dt)], axis=-1)
        h = StyleConv2d(
            ngf * 2, kernel_size=(1, 1), padding=0, dtype=dt, name="start_conv"
        )(h)
        h = DownConvBlock(ngf * 4, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv1")(
            h, t_embed
        )
        h = DownConvBlock(ngf * 8, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv2")(
            h, t_embed
        )
        h = DownConvBlock(ngf * 8, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv3")(
            h, t_embed
        )
        mid_feat = h  # 32x downsampled, ngf*8 channels (reference :233)
        h = DownConvBlock(ngf * 8, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv4")(
            h, t_embed
        )
        h = DownConvBlock(ngf * 8, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv5")(
            h, t_embed
        )
        h = DownConvBlock(ngf * 8, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv6")(
            h, t_embed
        )
        h = _minibatch_stddev(h)
        h = StyleConv2d(ngf * 8, dtype=dt, name="final_conv")(h)
        h = _lrelu(h)
        h = jnp.sum(h, axis=(1, 2))  # global sum-pool
        out = Dense(1, dtype=dt, name="end_linear")(h)
        return out.reshape(-1).astype(jnp.float32), mid_feat


class DiscriminatorImgLarge(nn.Module):
    """Image-only large critic (reference discriminator.py:266-349);
    returns only the logit (no mid_feat tap).  Dead code in the
    reference — and in fact broken there: its ``start_conv`` is built
    for ``nc`` input channels (:281) while forward feeds it
    ``cat(x, x_t)`` = 2*nc channels (:312-315), so the torch module
    crashes on first call.  Implemented here with the evident intent
    (channel-inferred start conv), so the capability actually works;
    the parameter count is pinned against the torch constructor in
    tests/test_models.py."""

    ngf: int = 32
    t_emb_dim: int = 128
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray
    ) -> jnp.ndarray:
        dt = self.dtype
        ngf = self.ngf
        t_embed = _lrelu(
            TimestepEmbedding(
                self.t_emb_dim, self.t_emb_dim, self.t_emb_dim, dtype=dt,
                name="t_embed",
            )(t)
        )
        h = jnp.concatenate([x.astype(dt), x_t.astype(dt)], axis=-1)
        h = StyleConv2d(
            ngf * 2, kernel_size=(1, 1), padding=0, dtype=dt, name="start_conv"
        )(h)
        for i, feats in enumerate(
            (ngf * 4, ngf * 8, ngf * 8, ngf * 8, ngf * 8, ngf * 8)
        ):
            h = DownConvBlock(
                feats, downsample=True, fir_kernel=self.fir_kernel,
                dtype=dt, name=f"conv{i + 1}",
            )(h, t_embed)
        h = _minibatch_stddev(h)
        h = StyleConv2d(ngf * 8, dtype=dt, name="final_conv")(h)
        h = _lrelu(h)
        h = jnp.sum(h, axis=(1, 2))
        out = Dense(1, dtype=dt, name="end_linear")(h)
        return out.reshape(-1).astype(jnp.float32)


class DiscriminatorSmall(nn.Module):
    """CIFAR-scale critic (reference discriminator.py:101-172); returns
    only the logit.  Unused by the shipped recipe; kept for capability
    parity."""

    ngf: int = 64
    t_emb_dim: int = 128
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray
    ) -> jnp.ndarray:
        dt = self.dtype
        ngf = self.ngf
        t_embed = _lrelu(
            TimestepEmbedding(
                self.t_emb_dim, self.t_emb_dim, self.t_emb_dim, dtype=dt,
                name="t_embed",
            )(t)
        )
        h = jnp.concatenate([x.astype(dt), x_t.astype(dt)], axis=-1)
        h = StyleConv2d(
            ngf * 2, kernel_size=(1, 1), padding=0, dtype=dt, name="start_conv"
        )(h)
        h = DownConvBlock(ngf * 2, dtype=dt, name="conv1")(h, t_embed)
        h = DownConvBlock(ngf * 4, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv2")(
            h, t_embed
        )
        h = DownConvBlock(ngf * 8, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv3")(
            h, t_embed
        )
        h = DownConvBlock(ngf * 8, downsample=True, fir_kernel=self.fir_kernel, dtype=dt, name="conv4")(
            h, t_embed
        )
        h = _minibatch_stddev(h)
        h = StyleConv2d(ngf * 8, init_scale=0.0, dtype=dt, name="final_conv")(h)
        h = _lrelu(h)
        h = jnp.sum(h, axis=(1, 2))
        out = Dense(1, dtype=dt, name="end_linear")(h)
        return out.astype(jnp.float32)
