"""MXU-fused condition-image stem bank.

The generator encodes x_t plus the condition images through N
independent two-conv stems (reference layerspp.py:394-423 ConvFeatBlock,
used at backbones/ncsnpp_generator_adagn_feat.py:177-184).  Run
separately, the N Cin=1 convs are pathological on TPU — measured
~50 ms for four 256^2 1->64 convs at B=32, ~0.5 TF/s, because a
1-channel input cannot fill the MXU's contracting dimension.  Packing
the N stems into ONE dense conv with a block-diagonal kernel runs the
same math 40x faster (~1.2 ms), and the N second convs (64->64, which
underfill the 128-lane MXU at 18.6 TF/s) speed up 2-3.6x the same way
(tools/bench_stem.py).

Two pieces:

* ``ConvFeatParams`` — a *declaration mirror* of ConvFeatBlock: it
  declares the EXACT same parameter tree (``conv1/conv/{kernel,bias}``,
  ``conv2/conv/{kernel,bias}``, same shapes, same initializers, and —
  because flax derives param RNGs from the scope path — the same
  initial values), but performs no computation.  Checkpoints, param
  counts, and weight-transplant mappings are unchanged.
* ``fused_convfeat_apply`` — runs all N stems in one pass on the
  channel-stacked input: block-diagonal conv1, one stacked GroupNorm
  (group boundaries never cross stems, so statistics are identical to
  per-stem GroupNorm), activation, block-diagonal conv2.  Off-diagonal
  kernel blocks are exact zeros, so every output value equals the
  per-stem computation (x + 0 == x in any float format).

Gradients flow only through the per-stem kernel parameters (the
block-diagonal assembly is a gather), so training is also exact.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mudiff_tpu.nn.initializers import default_init, stylegan_dense_init

Dtype = Any
Act = Callable[[jnp.ndarray], jnp.ndarray]


class ConvParams(nn.Module):
    """Declares nn.Conv's {kernel,bias} with Conv3x3's shapes/inits."""

    features: int
    in_ch: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel",
            default_init(self.init_scale),
            (3, 3, self.in_ch, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class Conv3x3Params(nn.Module):
    """Path mirror of Conv3x3 (which wraps nn.Conv under name 'conv')."""

    features: int
    in_ch: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return ConvParams(
            self.features, self.in_ch, self.init_scale, name="conv"
        )()


class ConvFeatParams(nn.Module):
    """Declaration mirror of ConvFeatBlock (nn/blocks.py:496-509):
    conv1 (in_ch->features), [param-free GroupNorm], conv2
    (features->features)."""

    features: int
    in_ch: int = 1

    @nn.compact
    def __call__(self):
        k1, b1 = Conv3x3Params(self.features, self.in_ch, name="conv1")()
        k2, b2 = Conv3x3Params(self.features, self.features, name="conv2")()
        return k1, b1, k2, b2


def block_diag_conv1(kernels: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """N kernels (3,3,1,F) -> one (3,3,N,N*F) block-diagonal kernel."""
    n = len(kernels)
    f = kernels[0].shape[-1]
    out = jnp.zeros((3, 3, n, n * f), kernels[0].dtype)
    for i, k in enumerate(kernels):
        out = out.at[:, :, i, i * f:(i + 1) * f].set(k[:, :, 0, :])
    return out


def block_diag_conv2(kernels: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """N kernels (3,3,F,F) -> one (3,3,N*F,N*F) block-diagonal kernel."""
    n = len(kernels)
    f = kernels[0].shape[-2]
    out = jnp.zeros((3, 3, n * f, n * f), kernels[0].dtype)
    for i, k in enumerate(kernels):
        out = out.at[:, :, i * f:(i + 1) * f, i * f:(i + 1) * f].set(k)
    return out


def grouped_stems() -> int:
    """Group count for lowering the block-diagonal stem/weight fusions
    as GROUPED convs (``feature_group_count``) instead of one dense
    block-diagonal kernel.

    The dense form burns N of the MXU's contracting dimension on exact
    zeros — N x the useful FLOPs (2.47 of G1's 13.4 conv TFLOP at nf=64
    B=32 is one such conv, tools/census_hlo.py) — but packs the MXU
    densely.  ``MUDIFF_GROUPED_STEMS=g`` splits the N stems into g
    super-groups: each group is a (N/g)-stem block-diagonal sub-kernel,
    so g=N is the pure grouped form (only useful FLOPs, F-wide groups
    that underfill the 128-lane MXU) and g=2 halves the waste while
    keeping 2F-wide (=128 at nf=64) groups.  Measured on chip
    (PERFORMANCE.md round 4): g=4/5 LOSES by ~13% (XLA lowers narrow
    groups poorly), g=2 is the interesting middle — the default here
    records the winner.  All forms are numerically identical (the dense
    form's extra terms are exact zeros) with an identical param tree;
    the choice is a trace-time lowering detail.  Fusions whose stem
    count g does not divide fall back to dense.
    """
    import os

    return int(os.environ.get("MUDIFF_GROUPED_STEMS", "1") or "1")


def _super_group_kernel(kernels: Sequence[jnp.ndarray], g: int):
    """Concatenate g block-diagonal chunk kernels along Cout.

    kernels: N per-stem (3,3,Cin_i,F) kernels with equal shapes.  The
    result is (3,3, (N/g)*Cin_i, N*F), valid as a feature_group_count=g
    conv kernel over the stem-stacked input."""
    n = len(kernels)
    assert n % g == 0
    m = n // g
    cin = kernels[0].shape[2]
    f = kernels[0].shape[3]
    chunks = []
    for ci in range(g):
        sub = kernels[ci * m:(ci + 1) * m]
        if cin == 1:
            blk = block_diag_conv1(sub)  # (3,3,m,m*F)
        else:
            blk = block_diag_conv2(sub)  # (3,3,m*cin,m*F)
        chunks.append(blk)
    return jnp.concatenate(chunks, axis=-1)


def stems_int8() -> bool:
    """Whether to route the fused stem conv2 through the W8A8 path when
    the model serves int8.

    The stem conv2 is the single largest conv in the forward (the
    block-diagonal 4·nf->4·nf at full resolution — 2.47 of G1's 13.45
    conv TFLOP at nf=64 B=32, tools/census_hlo.py) and is width-eligible
    under the shipped routing; round 4 excluded it by the design
    judgment that every downstream feature flows through it.  Round 5
    replaced that judgment with measurements (PERFORMANCE.md round-5
    routing-lever table + quality gate).

    Precedence: ``MUDIFF_INT8_STEMS`` env (``1``/``0``, the A/B
    override) > the ambient static calibration's recorded ``stems`` bit
    (the site list depends on it — serving MUST replay what recording
    did) > the default.  conv1 (Cin=n stems) and the G2 pseudo-GAP
    branch stay exact regardless — thin shapes the probe measured slow,
    and the pseudo branch feeds every AdaGN style.
    """
    import os

    from mudiff_tpu.ops.int8_conv import ambient_calib

    env = os.environ.get("MUDIFF_INT8_STEMS")
    if env is not None:
        return env == "1"
    calib = ambient_calib()
    if calib is not None:
        return bool(calib.stems)
    return STEMS_INT8_DEFAULT


# Default for the dynamic (uncalibrated) int8 mode and for recording
# new calibrations.  ON since round 5: the serialized forward A/B
# measured the quantized stem conv2 at -3.2% G1 time, end-to-end
# sampling at +2.0% (25.60 -> 26.10 slices/s/chip, session-matched
# legs), and the quality gate on the trained flagship64 checkpoint
# read +0.011 dB vs exact (PERFORMANCE.md round-5 stems section).
# ``MUDIFF_INT8_STEMS=0`` steps back to the round-4 routing.
STEMS_INT8_DEFAULT = True


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
          dtype, allow_int8: bool = False,
          groups: int = 1) -> jnp.ndarray:
    """Match flax nn.Conv numerics: promote to compute dtype, SAME-pad
    3x3, add bias in compute dtype.  Routes through the implicit-GEMM
    Pallas kernel when MUDIFF_GEMM_CONV=1 and the conv is wide enough
    to pack the MXU (covers the G2 cyclic-fusion gates, ~2.8 TFLOP of
    the forward).

    allow_int8: opt into the W8A8 serving path (ops/int8_conv.py) when
    the model was built with use_int8 — passed by the G2 cyclic-fusion
    gate/weight convs and (since round 5) the fused stem conv2 via
    :func:`stems_int8`; stem conv1 and the head stay exact (thin
    shapes the probe measured slow).

    groups: feature_group_count for the grouped lowering (kernel must
    then be (3,3,Cin/groups,Cout) with group-concatenated Cout); the
    int8/Pallas paths only handle dense convs, so groups>1 always takes
    the lax path."""
    from mudiff_tpu.ops.int8_conv import (
        int8_conv3x3,
        int8_conv_routed,
        int8_enabled,
    )
    from mudiff_tpu.ops.pallas_conv import conv3x3_gemm, gemm_conv_routed

    x = x.astype(dtype)
    if groups == 1:
        if (allow_int8 and int8_enabled()
                and int8_conv_routed(x.shape[-1], kernel.shape[-1])):
            return int8_conv3x3(x, kernel, bias, compute_dtype=dtype)
        if gemm_conv_routed(x.shape[-1], kernel.shape[-1]):
            # kernel adds fp32 bias to the fp32 accumulator (tighter
            # than nn.Conv's compute-dtype add; within bf16 tolerance)
            return conv3x3_gemm(x, kernel.astype(dtype), bias)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + bias.astype(dtype)


def stacked_group_norm(h: jnp.ndarray, n_stems: int,
                       groups_per_stem: int) -> jnp.ndarray:
    """Non-affine GroupNorm over an (..., N*F) stem-stacked tensor with
    group boundaries inside each stem — statistics identical to running
    per-stem GroupNorm(groups_per_stem) (eps 1e-6, fp32 stats, like
    PlainGroupNorm)."""
    return nn.GroupNorm(
        num_groups=n_stems * groups_per_stem,
        epsilon=1e-6,
        use_bias=False,
        use_scale=False,
        dtype=h.dtype,
    )(h)


def fused_convfeat_apply(
    stacked: jnp.ndarray,
    params: List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    act: Act,
    dtype,
) -> jnp.ndarray:
    """Apply N ConvFeatBlocks in one fused pass.

    stacked: (B,H,W,N) channel-stacked 1-channel inputs; params: list of
    (k1,b1,k2,b2) from ConvFeatParams.  Returns (B,H,W,N*F), laid out
    stem-major — equal to concatenating the per-stem outputs.
    """
    from mudiff_tpu.nn.blocks import _num_groups

    n = len(params)
    f = params[0][0].shape[-1]
    g = grouped_stems()
    groups = g if (g > 1 and n % g == 0) else 1
    if groups > 1:
        k1 = _super_group_kernel([p[0] for p in params], groups)
        k2 = _super_group_kernel([p[2] for p in params], groups)
    else:
        k1 = block_diag_conv1([p[0] for p in params])
        k2 = block_diag_conv2([p[2] for p in params])
    b1 = jnp.concatenate([p[1] for p in params])
    b2 = jnp.concatenate([p[3] for p in params])
    h = _conv(stacked, k1, b1, dtype, groups=groups)
    h = stacked_group_norm(h, n, _num_groups(f))
    h = act(h)
    return _conv(h, k2, b2, dtype, groups=groups,
                 allow_int8=stems_int8())


# ---------------------------------------------------------------------
# G2 (adaptive) condition encoding: declaration mirrors + fused apply
# ---------------------------------------------------------------------


class DenseParams(nn.Module):
    """Declares nn.Dense's {kernel,bias} with given shapes/inits."""

    features: int
    in_features: int
    kernel_init: Callable = None
    bias_init: Callable = None

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel",
            self.kernel_init or stylegan_dense_init(1.0),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias",
            self.bias_init or nn.initializers.zeros,
            (self.features,),
            jnp.float32,
        )
        return kernel, bias


class ConvBlockParams(nn.Module):
    """Declaration mirror of ConvBlock (nn/blocks.py:512-525): conv1,
    AdaptiveGroupNorm's style dense (path group_norm/style), conv2."""

    features: int
    style_dim: int = 256
    in_ch: int = 1

    @nn.compact
    def __call__(self):
        k1, b1 = Conv3x3Params(self.features, self.in_ch, name="conv1")()
        c = self.features

        def _style_bias(key, shape, dtype=jnp.float32):
            # AdaptiveGroupNorm inits the style bias to (gamma=1, beta=0)
            # (nn/blocks.py:99-102)
            return jnp.concatenate(
                [jnp.ones((c,), dtype), jnp.zeros((c,), dtype)]
            )

        class _GN(nn.Module):
            @nn.compact
            def __call__(self2):
                return DenseParams(
                    2 * c, self.style_dim,
                    kernel_init=stylegan_dense_init(1.0),
                    bias_init=_style_bias, name="style",
                )()

        sk, sb = _GN(name="group_norm")()
        k2, b2 = Conv3x3Params(self.features, self.features, name="conv2")()
        return k1, b1, sk, sb, k2, b2


class ConvBlockGAPParams(nn.Module):
    """Declaration mirror of ConvBlockGAP (nn/blocks.py:528-544): conv1,
    [param-free GroupNorm], conv2, fc (layers.Dense wraps nn.Dense under
    name 'dense')."""

    features: int
    zemb_dim: int = 256
    in_ch: int = 1

    @nn.compact
    def __call__(self):
        k1, b1 = Conv3x3Params(self.features, self.in_ch, name="conv1")()
        k2, b2 = Conv3x3Params(self.features, self.features, name="conv2")()

        class _FC(nn.Module):
            @nn.compact
            def __call__(self2):
                return DenseParams(
                    self.zemb_dim, self.features,
                    kernel_init=stylegan_dense_init(1.0),
                    bias_init=nn.initializers.zeros, name="dense",
                )()

        fk, fb = _FC(name="fc")()
        return k1, b1, k2, b2, fk, fb


def fused_adaptive_encode(
    x: jnp.ndarray,
    conds: List[jnp.ndarray],
    pseudo: jnp.ndarray,
    px,     # ConvFeatParams of encoder_x
    pcs,    # list of ConvBlockParams of encoder_c{i}
    pgap,   # ConvBlockGAPParams of pseudo_gap
    act: Act,
    dtype,
) -> Tuple[jnp.ndarray, List[jnp.ndarray], jnp.ndarray]:
    """G2 condition encoding, fused.

    Equivalent to (models/generator.py adaptive branch; reference
    ncsnpp_generator_adagn_feat.py:578-631):
      pseudo_weight = ConvBlockGAP(pseudo)
      x_feat = ConvFeatBlock(x)
      feats[i] = ConvBlock(conds[i], pseudo_weight)
    but all five Cin=1 first convs run as ONE block-diagonal conv, the
    five GroupNorms as ONE stacked GroupNorm, and the four non-pseudo
    second convs as ONE block-diagonal conv.  The pseudo branch's second
    conv stays separate (the style affine of the ConvBlocks depends on
    its output).  Returns (x_feat, feats, pseudo_weight).
    """
    from mudiff_tpu.nn.blocks import _num_groups

    n_c = len(conds)
    f = px[0].shape[-1]
    stems = [x] + conds + [pseudo]
    n = len(stems)
    stacked = jnp.concatenate(stems, axis=-1)

    genv = grouped_stems()
    g1 = genv if (genv > 1 and n % genv == 0) else 1
    k1s = [px[0]] + [p[0] for p in pcs] + [pgap[0]]
    if g1 > 1:
        k1 = _super_group_kernel(k1s, g1)
    else:
        k1 = block_diag_conv1(k1s)
    b1 = jnp.concatenate([px[1]] + [p[1] for p in pcs] + [pgap[1]])
    h = _conv(stacked, k1, b1, dtype, groups=g1)
    h = stacked_group_norm(h, n, _num_groups(f))

    # pseudo branch first: GAP style vector (sequential dependency)
    hp = act(h[..., n_c * f + f:])
    hp = _conv(hp, pgap[2], pgap[3], dtype)
    pw = jnp.mean(hp, axis=(1, 2))
    pseudo_weight = (
        pw @ pgap[4].astype(pw.dtype) + pgap[5].astype(pw.dtype)
    )

    # style affines for the condition blocks (AdaGN, nn/blocks.py:96-120)
    parts = [act(h[..., :f])]  # x stem: plain GN -> act
    for i, p in enumerate(pcs):
        gb = (
            pseudo_weight @ p[2].astype(pseudo_weight.dtype)
            + p[3].astype(pseudo_weight.dtype)
        )
        gamma, beta = jnp.split(gb, 2, axis=-1)
        hi = h[..., (i + 1) * f:(i + 2) * f]
        hi = gamma[:, None, None, :] * hi + beta[:, None, None, :]
        parts.append(act(hi))

    h4 = jnp.concatenate(parts, axis=-1)
    g2 = genv if (genv > 1 and (1 + n_c) % genv == 0) else 1
    k2s = [px[2]] + [p[4] for p in pcs]
    if g2 > 1:
        k2 = _super_group_kernel(k2s, g2)
    else:
        k2 = block_diag_conv2(k2s)
    b2 = jnp.concatenate([px[3]] + [p[5] for p in pcs])
    out = _conv(h4, k2, b2, dtype, groups=g2, allow_int8=stems_int8())
    x_feat = out[..., :f]
    feats = [out[..., (i + 1) * f:(i + 2) * f] for i in range(n_c)]
    return x_feat, feats, pseudo_weight


def fused_gate_convs(
    allc: jnp.ndarray,
    gate_params: List[Tuple[jnp.ndarray, jnp.ndarray]],
    dtype,
) -> List[jnp.ndarray]:
    """N gate convs share ONE input: concatenate kernels along Cout and
    run a single conv (no extra FLOPs, exact).  Returns the sigmoided
    per-gate outputs."""
    f = gate_params[0][0].shape[-1]
    k = jnp.concatenate([p[0] for p in gate_params], axis=-1)
    b = jnp.concatenate([p[1] for p in gate_params])
    g = jax.nn.sigmoid(_conv(allc, k, b, dtype, allow_int8=True))
    return [g[..., i * f:(i + 1) * f] for i in range(len(gate_params))]


def fused_weight_convs(
    inputs: List[jnp.ndarray],
    w_params: List[Tuple[jnp.ndarray, jnp.ndarray]],
    dtype,
) -> List[jnp.ndarray]:
    """N same-shape convs on N different inputs: block-diagonal fuse
    (or a grouped conv under MUDIFF_GROUPED_STEMS — which forgoes the
    int8 routing, so the A/B weighs int8-dense-with-4x-waste against
    bf16-grouped-without)."""
    f = w_params[0][0].shape[-1]
    g = grouped_stems()
    n = len(w_params)
    groups = g if (g > 1 and n % g == 0) else 1
    if groups > 1:
        k = _super_group_kernel([p[0] for p in w_params], groups)
    else:
        k = block_diag_conv2([p[0] for p in w_params])
    b = jnp.concatenate([p[1] for p in w_params])
    out = _conv(
        jnp.concatenate(inputs, axis=-1), k, b, dtype, allow_int8=True,
        groups=groups,
    )
    return [out[..., i * f:(i + 1) * f] for i in range(len(w_params))]
