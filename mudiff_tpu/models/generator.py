"""Conditional NCSN++ AdaGN generators (G1 contrast-specific, G2
contrast-aware adaptive).

One structured Flax module covers both reference models
(backbones/ncsnpp_generator_adagn_feat.py: NCSNpp:52-447,
NCSNpp_adaptive:450-905) via ``adaptive=True`` — the two differ only in
how the three condition images are encoded:

* G1: four plain ``ConvFeatBlock`` encoders (x_t, c1, c2, c3), features
  concatenated to nf*4 channels (reference :177-184, :318-330).
* G2: G1's prediction (``pseudo_target``) is embedded to a 256-d style by
  ``ConvBlock_GAP`` (:578, :733); the three condition encoders are
  style-modulated ``ConvBlock``s (:580-582, :760-767); their features are
  fused by cyclic pairwise attention (:620-631, :769-791).

The trunk is the same UNet: BigGAN-AdaGN resblocks, progressive-input
residual pyramid, Res-Attn-Res middle, skip-concat decoder, GroupNorm ->
SiLU -> conv3x3 -> tanh head.  Unlike the reference's flat
module-index-walk, submodules are named, so checkpoints are
self-describing pytrees.

Layout: NHWC; compute dtype configurable (bf16 on TPU).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.nn.blocks import (
    AdaptiveGroupNorm,
    AffineGroupNorm,
    AttnBlockpp,
    Combine,
    ConvBlock,
    ConvBlockGAP,
    ConvFeatBlock,
    Downsample,
    FIRConv2d,
    GaussianFourierProjection,
    ResnetBlockBigGANppAdagn,
    ResnetBlockBigGANppAdagnOne,
    ResnetBlockDDPMppAdagn,
    Upsample,
    _num_groups,
)
from mudiff_tpu.nn.initializers import default_init
from mudiff_tpu.nn.layers import (
    Conv3x3,
    Dense,
    PixelNorm,
    get_timestep_embedding,
)

Dtype = Any


class _ZTransform(nn.Module):
    """Latent mapping network: PixelNorm + (n_mlp+1) dense+SiLU
    (reference ncsnpp_generator_adagn_feat.py:271-277)."""

    z_emb_dim: int
    n_mlp: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = PixelNorm()(z)
        h = jax.nn.silu(Dense(self.z_emb_dim, dtype=self.dtype, name="fc0")(h))
        for i in range(self.n_mlp):
            h = jax.nn.silu(
                Dense(self.z_emb_dim, dtype=self.dtype, name=f"fc{i + 1}")(h)
            )
        return h


class NCSNppGenerator(nn.Module):
    """NCSN++ with AdaGN; ``adaptive=True`` gives the G2 variant."""

    config: MuDiffConfig
    adaptive: bool = False
    # 3 = standard MU-Diff; 2 = the in-house "healthy" two-condition
    # variant (reference ncsnpp_generator_adagn_feat_healthy.py:
    # hs seed nf*3 / nf*2 at :180-184/:583-587, single pairwise fusion
    # at :620-631/:755-759).
    num_conditions: int = 3
    dtype: Dtype = jnp.float32
    # Optional static int8 activation calibration (ops/int8_conv.py).
    # A module field so a calibrated and an uncalibrated model can never
    # share a jit trace; None = dynamic per-example scales.
    int8_calib: Optional[Any] = None
    # Routing-threshold override for calibration/A-B runs (None = the
    # width-aware default max(64, 2*nf)); a calibration's own threshold
    # still wins once int8_calib is set.
    int8_min_ch: Optional[int] = None

    def __call__(
        self,
        x: jnp.ndarray,
        cond1: jnp.ndarray,
        cond2: jnp.ndarray,
        cond3: Optional[jnp.ndarray] = None,
        time_cond: jnp.ndarray = None,
        z: jnp.ndarray = None,
        pseudo_target: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        # int8 serving mode: the scope flag is read by Conv3x3 at trace
        # time, so it must cover the whole forward trace.  It travels
        # with the config that built this module — a model constructed
        # with use_int8=False can never pick up a stale flag, because
        # the scope is (re)entered on every trace.  Inference-only:
        # training keeps the bf16 path (no straight-through estimator).
        from mudiff_tpu.ops.int8_conv import int8_scope

        # Routing threshold 2*nf: quantize every level EXCEPT the
        # full-resolution nf-wide one — the on-chip winner at both
        # flagship widths under dynamic scales (PERFORMANCE.md int8
        # routing table).  A static calibration (int8_calib) overrides
        # the threshold with the one it was recorded under.
        with int8_scope(
            self.config.use_int8 and not train,
            min_ch=(self.int8_min_ch
                    or max(64, 2 * self.config.num_channels_dae)),
            calib=self.int8_calib,
        ):
            return self._forward(
                x, cond1, cond2, cond3, time_cond, z, pseudo_target, train
            )

    @nn.compact
    def _forward(
        self,
        x: jnp.ndarray,
        cond1: jnp.ndarray,
        cond2: jnp.ndarray,
        cond3: Optional[jnp.ndarray],
        time_cond: jnp.ndarray,
        z: jnp.ndarray,
        pseudo_target: Optional[jnp.ndarray],
        train: bool,
    ) -> jnp.ndarray:
        assert (cond3 is None) == (self.num_conditions == 2), (
            "pass cond3 iff num_conditions == 3"
        )
        cfg = self.config
        act = jax.nn.silu
        nf = cfg.num_channels_dae
        ch_mult = cfg.ch_mult
        num_res_blocks = cfg.num_res_blocks
        attn_resolutions = cfg.attn_resolutions
        num_resolutions = len(ch_mult)
        all_resolutions = [cfg.image_size // (2 ** i) for i in range(num_resolutions)]
        fir, fir_kernel = cfg.fir, cfg.fir_kernel
        skip_rescale = cfg.skip_rescale
        resblock_type = cfg.resblock_type.lower()
        progressive = cfg.progressive.lower()
        progressive_input = cfg.progressive_input.lower()
        embedding_type = cfg.embedding_type.lower()
        combine_method = cfg.progressive_combine.lower()
        channels = cfg.num_channels
        dt = self.dtype

        assert progressive in ("none", "output_skip", "residual")
        assert progressive_input in ("none", "input_skip", "residual")
        assert embedding_type in ("fourier", "positional")

        # Block-granular rematerialization: wrapping each res/attn block
        # in nn.remat caps the backward peak at ONE block's activations
        # instead of the whole UNet's (full-model jax.checkpoint still
        # re-materializes every activation at once during the backward
        # recompute — measured 23.4G vs 15.75G HBM for the nf=128 256²
        # G step).  Param trees/names are unchanged by the transform.
        #
        # grad_checkpoint_policy (round-3 verdict #3):
        #   "blocks" — remat every block (max memory saving, ~1.5x
        #              recompute; the round-2 default)
        #   "hires" / "hiresN" — remat only blocks at resolution
        #              >= image_size/N (N=2 for plain "hires"), where
        #              the big activations live; the low-res levels
        #              keep their activations and pay no recompute.
        #              Per-block stored bytes halve per level while
        #              per-block FLOPs stay constant (channel doubling
        #              cancels resolution halving), so each level added
        #              to the remat set buys ~equal HBM for ~equal
        #              recompute.  Measured nf=128 b=4 256²: "hires"
        #              (N=2) misses the 15.75G chip by 360M (16.10G,
        #              1.57G fragmentation — chip compile log 2026-08-17),
        #              hence "hires4" remats one more level.
        remat = cfg.use_grad_checkpoint
        policy = getattr(cfg, "grad_checkpoint_policy", "blocks")
        if policy.startswith("hires"):
            hires_cut = cfg.image_size // int(policy[5:] or "2")
        else:
            hires_cut = 0

        def want_remat(res):
            if not remat:
                return False
            if policy.startswith("hires"):
                return res >= hires_cut
            return True

        def resblock(name, out_ch=None, up=False, down=False, res=None):
            do_remat = want_remat(
                res if res is not None else all_resolutions[-1]
            )
            if resblock_type == "ddpm":
                cls = ResnetBlockDDPMppAdagn
                if do_remat:
                    # (self, x, temb, zemb, train) -> train is static
                    cls = nn.remat(cls, static_argnums=(4,))
                return cls(
                    act=act, features=out_ch, dropout=cfg.dropout,
                    skip_rescale=skip_rescale, init_scale=0.0, dtype=dt,
                    name=name,
                )
            cls = (
                ResnetBlockBigGANppAdagnOne
                if resblock_type == "biggan_oneadagn"
                else ResnetBlockBigGANppAdagn
            )
            if do_remat:
                cls = nn.remat(cls, static_argnums=(4,))
            return cls(
                act=act, features=out_ch, up=up, down=down,
                dropout=cfg.dropout, fir=fir, fir_kernel=fir_kernel,
                skip_rescale=skip_rescale, init_scale=0.0, dtype=dt,
                name=name,
            )

        def attnblock(name, res=None):
            do_remat = want_remat(
                res if res is not None else all_resolutions[-1]
            )
            cls = nn.remat(AttnBlockpp) if do_remat else AttnBlockpp
            return cls(
                skip_rescale=skip_rescale, init_scale=0.0, dtype=dt, name=name
            )

        # --- embeddings -------------------------------------------------
        zemb = _ZTransform(
            cfg.z_emb_dim, cfg.n_mlp, dtype=dt, name="z_transform"
        )(z)

        if embedding_type == "fourier":
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=cfg.fourier_scale, name="fourier_emb"
            )(jnp.log(time_cond.astype(jnp.float32)))
        else:
            temb = get_timestep_embedding(time_cond, nf)
        if cfg.conditional:
            temb = nn.Dense(
                nf * 4, kernel_init=default_init(),
                bias_init=nn.initializers.zeros, dtype=dt,
                param_dtype=jnp.float32, name="temb_dense0",
            )(temb.astype(dt))
            temb = nn.Dense(
                nf * 4, kernel_init=default_init(),
                bias_init=nn.initializers.zeros, dtype=dt,
                param_dtype=jnp.float32, name="temb_dense1",
            )(act(temb))
        else:
            temb = None

        if not cfg.centered:
            x = 2 * x - 1.0
        x = x.astype(dt)
        conds = [cond1.astype(dt), cond2.astype(dt)]
        if self.num_conditions == 3:
            conds.append(cond3.astype(dt))

        input_pyramid = None
        if progressive_input != "none":
            input_pyramid = x

        # --- condition encoding ----------------------------------------
        if not self.adaptive:
            # The four stems run as ONE block-diagonal fused conv pair —
            # exact same math/params as four ConvFeatBlocks, 2-40x faster
            # on the MXU (nn/fused_stems.py; tools/bench_stem.py).
            from mudiff_tpu.nn.fused_stems import (
                ConvFeatParams,
                fused_convfeat_apply,
            )

            names = ["encoder_x"] + [
                f"encoder_c{i + 1}" for i in range(len(conds))
            ]
            if channels == 1:
                stem_params = [ConvFeatParams(nf, name=n)() for n in names]
                stacked = jnp.concatenate([x] + conds, axis=-1)
                stem_fn = lambda s, ps: fused_convfeat_apply(s, ps, act, dt)
                if remat:
                    # the stems run outside the rematted blocks; at
                    # nf=128 256² their stored activations are the
                    # largest single allocations in the G step (~0.8G)
                    stem_fn = jax.checkpoint(stem_fn)
                h = stem_fn(stacked, stem_params)
            else:
                # the block-diagonal fusion assumes 1-channel stems;
                # multi-channel configs use the per-stem modules (same
                # param tree as ConvFeatParams mirrors — checkpoints
                # are interchangeable at channels==1)
                h = jnp.concatenate(
                    [
                        ConvFeatBlock(
                            act=act, features=nf, dtype=dt, name=n
                        )(img)
                        for n, img in zip(names, [x] + conds)
                    ],
                    axis=-1,
                )
        else:
            assert pseudo_target is not None, (
                "adaptive generator requires pseudo_target (G1's prediction)"
            )
            from mudiff_tpu.nn.fused_stems import (
                Conv3x3Params,
                ConvBlockGAPParams,
                ConvBlockParams,
                ConvFeatParams,
                fused_adaptive_encode,
                fused_gate_convs,
                fused_weight_convs,
            )

            # The pseudo-target style vector is 256-d regardless of
            # z_emb_dim: the reference's ConvBlock_GAP partial never
            # passes zemb_dim, so the layerspp default of 256 applies
            # (ncsnpp_generator_adagn_feat.py:555-557, layerspp.py:459).
            # All five Cin=1 stem convs + the four trunk-side second
            # convs run as fused block-diagonal convs (nn/fused_stems.py
            # — exact math, 2-40x faster on the MXU).
            if channels == 1:
                px = ConvFeatParams(nf, name="encoder_x")()
                pcs = [
                    ConvBlockParams(
                        nf, style_dim=256, name=f"encoder_c{i + 1}"
                    )()
                    for i in range(len(conds))
                ]
                pgap = ConvBlockGAPParams(nf, zemb_dim=256,
                                          name="pseudo_gap")()
                enc_fn = lambda xa, ca, pt, a, b_, c: fused_adaptive_encode(
                    xa, ca, pt, a, b_, c, act, dt
                )
                if remat:
                    # the adaptive encode's concat/silu intermediates
                    # were the two largest allocations (0.8G each) in
                    # the nf=128 G step
                    enc_fn = jax.checkpoint(enc_fn)
                x_feat, feats, _pw = enc_fn(
                    x, conds, pseudo_target.astype(dt), px, pcs, pgap
                )
            else:
                # the block-diagonal fusion assumes 1-channel stems;
                # multi-channel configs use the per-stem modules (same
                # param tree as the *Params mirrors).  The gates below
                # consume nf-channel features and are unaffected.
                style = ConvBlockGAP(
                    act=act, features=nf, zemb_dim=256, dtype=dt,
                    name="pseudo_gap",
                )(pseudo_target.astype(dt))
                x_feat = ConvFeatBlock(
                    act=act, features=nf, dtype=dt, name="encoder_x"
                )(x)
                feats = [
                    ConvBlock(
                        act=act, features=nf, dtype=dt,
                        name=f"encoder_c{i + 1}",
                    )(c, style)
                    for i, c in enumerate(conds)
                ]
            allc = jnp.concatenate(feats, axis=-1)

            if self.num_conditions == 3:
                # cyclic pairwise attention fusion (reference :620-631,
                # :769-791): the six gates share one input -> one conv;
                # the three weight convs -> one block-diagonal conv
                gate_names = [
                    "feat_att1_c12", "feat_att2_c12",
                    "feat_att1_c23", "feat_att2_c23",
                    "feat_att1_c31", "feat_att2_c31",
                ]
                gp = [
                    Conv3x3Params(nf, allc.shape[-1], name=n)()
                    for n in gate_names
                ]
                c1, c2, c3 = feats
                wp = [
                    Conv3x3Params(nf, nf, name=f"feat_weight_c{i + 1}")()
                    for i in range(3)
                ]

                def fuse3(allc_a, c1_a, c2_a, c3_a, xf_a, gp_a, wp_a):
                    (a1_12, a2_12, a1_23, a2_23, a1_31,
                     a2_31) = fused_gate_convs(allc_a, gp_a, dt)
                    c1_att, c2_att, c3_att = fused_weight_convs(
                        [a1_12 * c1_a, a1_23 * c2_a, a1_31 * c3_a],
                        wp_a, dt,
                    )
                    fused12 = a2_12 * c1_att + (1 - a2_12) * c2_a
                    fused23 = a2_23 * c2_att + (1 - a2_23) * c3_a
                    fused31 = a2_31 * c3_att + (1 - a2_31) * c1_a
                    return jnp.concatenate(
                        [xf_a, fused12, fused23, fused31], axis=-1
                    )

                if remat:
                    # gates/fusion run at full resolution outside the
                    # rematted blocks — their stored activations
                    # dominated the nf=128 G-step HBM peak
                    fuse3 = jax.checkpoint(fuse3)
                h = fuse3(allc, c1, c2, c3, x_feat, gp, wp)
            else:
                # single pairwise fusion (healthy reference :620-631,
                # :749-759)
                c1, c2 = feats
                gp = [
                    Conv3x3Params(nf, allc.shape[-1], name=n)()
                    for n in ("feat_att1_c12", "feat_att2_c12")
                ]
                wp1 = [Conv3x3Params(nf, nf, name="feat_weight_c1")()]

                def fuse2(allc_a, c1_a, c2_a, xf_a, gp_a, wp_a):
                    a1_12, a2_12 = fused_gate_convs(allc_a, gp_a, dt)
                    (c1_att,) = fused_weight_convs(
                        [a1_12 * c1_a], wp_a, dt
                    )
                    fused12 = a2_12 * c1_att + (1 - a2_12) * c2_a
                    return jnp.concatenate([xf_a, fused12], axis=-1)

                if remat:
                    fuse2 = jax.checkpoint(fuse2)
                h = fuse2(allc, c1, c2, x_feat, gp, wp1)

        # --- encoder ----------------------------------------------------
        hs = [h]
        input_pyramid_ch = channels
        for i_level in range(num_resolutions):
            for i_block in range(num_res_blocks):
                out_ch = nf * ch_mult[i_level]
                h = resblock(f"down_{i_level}_{i_block}", out_ch,
                             res=all_resolutions[i_level])(
                    hs[-1], temb, zemb, train
                )
                if all_resolutions[i_level] in attn_resolutions:
                    h = attnblock(f"down_attn_{i_level}_{i_block}",
                                  res=all_resolutions[i_level])(h)
                hs.append(h)

            if i_level != num_resolutions - 1:
                if resblock_type == "ddpm":
                    h = Downsample(
                        with_conv=cfg.resamp_with_conv, fir=fir,
                        fir_kernel=fir_kernel, dtype=dt,
                        name=f"downsample_{i_level}",
                    )(hs[-1])
                else:
                    h = resblock(f"downsample_{i_level}", down=True,
                                 res=all_resolutions[i_level])(
                        hs[-1], temb, zemb, train
                    )
                if progressive_input == "input_skip":
                    input_pyramid = Downsample(
                        fir=fir, fir_kernel=fir_kernel, with_conv=False,
                        dtype=dt, name=f"pyramid_downsample_{i_level}",
                    )(input_pyramid)
                    h = Combine(
                        features=h.shape[-1], method=combine_method, dtype=dt,
                        name=f"combine_{i_level}",
                    )(input_pyramid, h)
                elif progressive_input == "residual":
                    input_pyramid = Downsample(
                        features=h.shape[-1], fir=fir, fir_kernel=fir_kernel,
                        with_conv=True, dtype=dt,
                        name=f"pyramid_downsample_{i_level}",
                    )(input_pyramid)
                    if skip_rescale:
                        input_pyramid = (
                            (input_pyramid + h) / np.sqrt(2.0)
                        ).astype(h.dtype)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- middle -----------------------------------------------------
        h = hs[-1]
        h = resblock("mid_block1")(h, temb, zemb, train)
        h = attnblock("mid_attn")(h)
        h = resblock("mid_block2")(h, temb, zemb, train)

        # --- decoder ----------------------------------------------------
        pyramid = None
        pyramid_ch = 0
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(num_res_blocks + 1):
                out_ch = nf * ch_mult[i_level]
                h = resblock(f"up_{i_level}_{i_block}", out_ch,
                             res=all_resolutions[i_level])(
                    jnp.concatenate([h, hs.pop()], axis=-1),
                    temb, zemb, train,
                )
            if all_resolutions[i_level] in attn_resolutions:
                h = attnblock(f"up_attn_{i_level}",
                              res=all_resolutions[i_level])(h)

            if progressive != "none":
                if i_level == num_resolutions - 1:
                    if progressive == "output_skip":
                        pyramid = act(
                            AffineGroupNorm(
                                _num_groups(h.shape[-1]), dtype=dt,
                                name=f"pyramid_norm_{i_level}",
                            )(h)
                        )
                        pyramid = Conv3x3(
                            channels, init_scale=0.0, dtype=dt,
                            name=f"pyramid_conv_{i_level}",
                        )(pyramid)
                        pyramid_ch = channels
                    else:  # residual
                        pyramid = act(
                            AffineGroupNorm(
                                _num_groups(h.shape[-1]), dtype=dt,
                                name=f"pyramid_norm_{i_level}",
                            )(h)
                        )
                        pyramid = Conv3x3(
                            h.shape[-1], dtype=dt,
                            name=f"pyramid_conv_{i_level}",
                        )(pyramid)
                        pyramid_ch = h.shape[-1]
                else:
                    if progressive == "output_skip":
                        pyramid = Upsample(
                            fir=fir, fir_kernel=fir_kernel, with_conv=False,
                            dtype=dt, name=f"pyramid_upsample_nc_{i_level}",
                        )(pyramid)
                        pyramid_h = act(
                            AffineGroupNorm(
                                _num_groups(h.shape[-1]), dtype=dt,
                                name=f"pyramid_norm_{i_level}",
                            )(h)
                        )
                        pyramid_h = Conv3x3(
                            channels, init_scale=0.0, dtype=dt,
                            name=f"pyramid_conv_{i_level}",
                        )(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = Upsample(
                            features=h.shape[-1], fir=fir,
                            fir_kernel=fir_kernel, with_conv=True, dtype=dt,
                            name=f"pyramid_upsample_{i_level}",
                        )(pyramid)
                        if skip_rescale:
                            pyramid = ((pyramid + h) / np.sqrt(2.0)).astype(
                                h.dtype
                            )
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if resblock_type == "ddpm":
                    h = Upsample(
                        with_conv=cfg.resamp_with_conv, fir=fir,
                        fir_kernel=fir_kernel, dtype=dt,
                        name=f"upsample_{i_level}",
                    )(h)
                else:
                    h = resblock(f"upsample_{i_level}", up=True,
                                 res=all_resolutions[i_level])(
                        h, temb, zemb, train
                    )

        assert not hs

        if progressive == "output_skip":
            h = pyramid
        else:
            h = act(
                AffineGroupNorm(
                    _num_groups(h.shape[-1]), dtype=dt, name="final_norm"
                )(h)
            )
            h = Conv3x3(
                channels, init_scale=0.0, dtype=dt, name="final_conv"
            )(h)

        if not cfg.not_use_tanh:
            return jnp.tanh(h.astype(jnp.float32))
        return h.astype(jnp.float32)
