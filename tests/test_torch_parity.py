"""Numerical parity vs the reference torch implementation (CPU).

These tests copy weights from freshly-built reference torch modules into
the corresponding flax modules and compare forward outputs.  Combined
with the exact parameter-count tests (test_models.py) this pins both the
architecture graph and the per-block math.

Skipped automatically when torch or the read-only reference checkout is
unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "backbones")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

TOL = dict(atol=2e-4, rtol=2e-4)


def t2j_conv(w):
    """torch conv weight (O, I, kh, kw) -> flax HWIO."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_dense(w):
    """torch linear weight (O, I) -> flax (I, O)."""
    return jnp.asarray(w.detach().numpy().T)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


def test_timestep_embedding_parity():
    from backbones.layers import get_timestep_embedding as ref_emb

    from mudiff_tpu.nn.layers import get_timestep_embedding

    t = np.array([0, 1, 2, 3], np.int64)
    ref = ref_emb(torch.from_numpy(t), 64).numpy()
    mine = np.asarray(get_timestep_embedding(jnp.asarray(t), 64))
    np.testing.assert_allclose(mine, ref, **TOL)


def test_adaptive_group_norm_parity():
    from backbones.layerspp import AdaptiveGroupNorm as RefAdaGN

    from mudiff_tpu.nn.blocks import AdaptiveGroupNorm

    rng = np.random.RandomState(0)
    c, zdim = 32, 16
    x = rng.randn(2, 8, 8, c).astype(np.float32)
    style = rng.randn(2, zdim).astype(np.float32)

    ref_mod = RefAdaGN(min(c // 4, 32), c, zdim)
    ref_out = nhwc(ref_mod(nchw(x), torch.from_numpy(style)))

    mod = AdaptiveGroupNorm()
    params = {
        "style": {
            "kernel": t2j_dense(ref_mod.style.weight),
            "bias": jnp.asarray(ref_mod.style.bias.detach().numpy()),
        }
    }
    mine = np.asarray(
        mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(style))
    )
    np.testing.assert_allclose(mine, ref_out, **TOL)


def test_biggan_resblock_parity():
    from backbones.layerspp import ResnetBlockBigGANpp_Adagn as RefBlock

    from mudiff_tpu.nn.blocks import ResnetBlockBigGANppAdagn

    rng = np.random.RandomState(1)
    in_ch, out_ch, temb_dim, zdim = 32, 48, 24, 16
    x = rng.randn(2, 16, 16, in_ch).astype(np.float32)
    temb = rng.randn(2, temb_dim).astype(np.float32)
    zemb = rng.randn(2, zdim).astype(np.float32)

    ref_mod = RefBlock(
        act=torch.nn.SiLU(), in_ch=in_ch, out_ch=out_ch, temb_dim=temb_dim,
        zemb_dim=zdim, fir=True, fir_kernel=[1, 3, 3, 1],
        skip_rescale=True, dropout=0.0,
    )
    ref_mod.eval()
    with torch.no_grad():
        ref_out = nhwc(
            ref_mod(nchw(x), torch.from_numpy(temb), torch.from_numpy(zemb))
        )

    mod = ResnetBlockBigGANppAdagn(
        act=jax.nn.silu, features=out_ch, fir=True,
        fir_kernel=(1, 3, 3, 1), skip_rescale=True, dropout=0.0,
    )
    params = {
        "GroupNorm_0": {"style": {
            "kernel": t2j_dense(ref_mod.GroupNorm_0.style.weight),
            "bias": jnp.asarray(
                ref_mod.GroupNorm_0.style.bias.detach().numpy()),
        }},
        "Conv_0": {"conv": {
            "kernel": t2j_conv(ref_mod.Conv_0.weight),
            "bias": jnp.asarray(ref_mod.Conv_0.bias.detach().numpy()),
        }},
        "Dense_0": {"dense": {
            "kernel": t2j_dense(ref_mod.Dense_0.weight),
            "bias": jnp.asarray(ref_mod.Dense_0.bias.detach().numpy()),
        }},
        "GroupNorm_1": {"style": {
            "kernel": t2j_dense(ref_mod.GroupNorm_1.style.weight),
            "bias": jnp.asarray(
                ref_mod.GroupNorm_1.style.bias.detach().numpy()),
        }},
        "Conv_1": {"conv": {
            "kernel": t2j_conv(ref_mod.Conv_1.weight),
            "bias": jnp.asarray(ref_mod.Conv_1.bias.detach().numpy()),
        }},
        "Conv_2": {"conv": {
            "kernel": t2j_conv(ref_mod.Conv_2.weight),
            "bias": jnp.asarray(ref_mod.Conv_2.bias.detach().numpy()),
        }},
    }
    mine = np.asarray(mod.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(temb),
        jnp.asarray(zemb),
    ))
    np.testing.assert_allclose(mine, ref_out, **TOL)


def test_biggan_resblock_down_parity():
    """The FIR-downsampling resblock variant (hot path at every level
    transition)."""
    from backbones.layerspp import ResnetBlockBigGANpp_Adagn as RefBlock

    from mudiff_tpu.nn.blocks import ResnetBlockBigGANppAdagn

    rng = np.random.RandomState(2)
    ch, temb_dim, zdim = 32, 24, 16
    x = rng.randn(2, 16, 16, ch).astype(np.float32)
    temb = rng.randn(2, temb_dim).astype(np.float32)
    zemb = rng.randn(2, zdim).astype(np.float32)

    ref_mod = RefBlock(
        act=torch.nn.SiLU(), in_ch=ch, temb_dim=temb_dim, zemb_dim=zdim,
        down=True, fir=True, fir_kernel=[1, 3, 3, 1], skip_rescale=True,
        dropout=0.0,
    )
    ref_mod.eval()
    with torch.no_grad():
        ref_out = nhwc(
            ref_mod(nchw(x), torch.from_numpy(temb), torch.from_numpy(zemb))
        )
    assert ref_out.shape == (2, 8, 8, ch)

    mod = ResnetBlockBigGANppAdagn(
        act=jax.nn.silu, down=True, fir=True, fir_kernel=(1, 3, 3, 1),
        skip_rescale=True, dropout=0.0,
    )
    params = {
        "GroupNorm_0": {"style": {
            "kernel": t2j_dense(ref_mod.GroupNorm_0.style.weight),
            "bias": jnp.asarray(
                ref_mod.GroupNorm_0.style.bias.detach().numpy()),
        }},
        "Conv_0": {"conv": {
            "kernel": t2j_conv(ref_mod.Conv_0.weight),
            "bias": jnp.asarray(ref_mod.Conv_0.bias.detach().numpy()),
        }},
        "Dense_0": {"dense": {
            "kernel": t2j_dense(ref_mod.Dense_0.weight),
            "bias": jnp.asarray(ref_mod.Dense_0.bias.detach().numpy()),
        }},
        "GroupNorm_1": {"style": {
            "kernel": t2j_dense(ref_mod.GroupNorm_1.style.weight),
            "bias": jnp.asarray(
                ref_mod.GroupNorm_1.style.bias.detach().numpy()),
        }},
        "Conv_1": {"conv": {
            "kernel": t2j_conv(ref_mod.Conv_1.weight),
            "bias": jnp.asarray(ref_mod.Conv_1.bias.detach().numpy()),
        }},
        "Conv_2": {"conv": {
            "kernel": t2j_conv(ref_mod.Conv_2.weight),
            "bias": jnp.asarray(ref_mod.Conv_2.bias.detach().numpy()),
        }},
    }
    mine = np.asarray(mod.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(temb),
        jnp.asarray(zemb),
    ))
    np.testing.assert_allclose(mine, ref_out, **TOL)


def test_attention_block_parity():
    from backbones.layerspp import AttnBlockpp as RefAttn

    from mudiff_tpu.nn.blocks import AttnBlockpp

    rng = np.random.RandomState(3)
    c = 32
    x = rng.randn(2, 8, 8, c).astype(np.float32)
    ref_mod = RefAttn(channels=c, skip_rescale=True)
    with torch.no_grad():
        ref_out = nhwc(ref_mod(nchw(x)))

    mod = AttnBlockpp(skip_rescale=True)
    params = {
        "GroupNorm_0": {"GroupNorm_0": {
            "scale": jnp.asarray(ref_mod.GroupNorm_0.weight.detach().numpy()),
            "bias": jnp.asarray(ref_mod.GroupNorm_0.bias.detach().numpy()),
        }},
        "NIN_0": {"W": jnp.asarray(ref_mod.NIN_0.W.detach().numpy()),
                  "b": jnp.asarray(ref_mod.NIN_0.b.detach().numpy())},
        "NIN_1": {"W": jnp.asarray(ref_mod.NIN_1.W.detach().numpy()),
                  "b": jnp.asarray(ref_mod.NIN_1.b.detach().numpy())},
        "NIN_2": {"W": jnp.asarray(ref_mod.NIN_2.W.detach().numpy()),
                  "b": jnp.asarray(ref_mod.NIN_2.b.detach().numpy())},
        "NIN_3": {"W": jnp.asarray(ref_mod.NIN_3.W.detach().numpy()),
                  "b": jnp.asarray(ref_mod.NIN_3.b.detach().numpy())},
    }
    mine = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(mine, ref_out, **TOL)


def test_discriminator_large_parity():
    """Full critic forward parity, including minibatch-stddev and the
    (logit, mid_feat) dual output."""
    from backbones.discriminator import Discriminator_large as RefD

    from mudiff_tpu.models import DiscriminatorLarge

    rng = np.random.RandomState(4)
    ngf, t_emb_dim = 8, 16
    x = rng.randn(4, 64, 64, 1).astype(np.float32)
    xt = rng.randn(4, 64, 64, 1).astype(np.float32)
    t = np.array([0, 1, 2, 3], np.int64)

    ref_mod = RefD(nc=2, ngf=ngf, t_emb_dim=t_emb_dim,
                   act=torch.nn.LeakyReLU(0.2))
    ref_mod.eval()
    with torch.no_grad():
        ref_logit, ref_mid = ref_mod(
            nchw(x), torch.from_numpy(t), nchw(xt)
        )
    ref_logit = ref_logit.numpy()
    ref_mid = nhwc(ref_mid)

    mod = DiscriminatorLarge(ngf=ngf, t_emb_dim=t_emb_dim)

    def dcb(ref_block):
        return {
            "conv1": {"conv": {
                "kernel": t2j_conv(ref_block.conv1[0].weight),
                "bias": jnp.asarray(ref_block.conv1[0].bias.detach().numpy()),
            }},
            "conv2": {"conv": {
                "kernel": t2j_conv(ref_block.conv2[0].weight),
                "bias": jnp.asarray(ref_block.conv2[0].bias.detach().numpy()),
            }},
            "dense_t1": {"dense": {
                "kernel": t2j_dense(ref_block.dense_t1.weight),
                "bias": jnp.asarray(
                    ref_block.dense_t1.bias.detach().numpy()),
            }},
            "skip": {"conv": {
                "kernel": t2j_conv(ref_block.skip[0].weight),
            }},
        }

    params = {
        "t_embed": {
            "fc0": {"dense": {
                "kernel": t2j_dense(ref_mod.t_embed.main[0].weight),
                "bias": jnp.asarray(
                    ref_mod.t_embed.main[0].bias.detach().numpy()),
            }},
            "fc1": {"dense": {
                "kernel": t2j_dense(ref_mod.t_embed.main[2].weight),
                "bias": jnp.asarray(
                    ref_mod.t_embed.main[2].bias.detach().numpy()),
            }},
        },
        "start_conv": {"conv": {
            "kernel": t2j_conv(ref_mod.start_conv.weight),
            "bias": jnp.asarray(ref_mod.start_conv.bias.detach().numpy()),
        }},
        "conv1": dcb(ref_mod.conv1),
        "conv2": dcb(ref_mod.conv2),
        "conv3": dcb(ref_mod.conv3),
        "conv4": dcb(ref_mod.conv4),
        "conv5": dcb(ref_mod.conv5),
        "conv6": dcb(ref_mod.conv6),
        "final_conv": {"conv": {
            "kernel": t2j_conv(ref_mod.final_conv.weight),
            "bias": jnp.asarray(ref_mod.final_conv.bias.detach().numpy()),
        }},
        "end_linear": {"dense": {
            "kernel": t2j_dense(ref_mod.end_linear.weight),
            "bias": jnp.asarray(ref_mod.end_linear.bias.detach().numpy()),
        }},
    }
    logit, mid = mod.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(xt)
    )
    np.testing.assert_allclose(np.asarray(mid), ref_mid, **TOL)
    np.testing.assert_allclose(np.asarray(logit), ref_logit, atol=2e-3)
