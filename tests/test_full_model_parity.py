"""Full-model numerical parity: transplant every weight of the torch
reference generators into the flax modules and compare forward outputs.

The reference walks a flat all_modules list by index
(ncsnpp_generator_adagn_feat.py:279-447); the mapping below re-derives
that construction order for the shipped config family (positional
embedding, biggan blocks, progressive='none', progressive_input=
'residual') and pairs each torch module with its named flax submodule.
A passing test pins the entire wiring end to end, on top of the
per-block parity (test_torch_parity.py) and exact parameter counts
(test_models.py).
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

import argparse

import jax
import jax.numpy as jnp

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.models import NCSNppGenerator

NF = 16
IMG = 32
CFG = MuDiffConfig(
    image_size=IMG, num_channels=1, num_channels_dae=NF, ch_mult=(1, 2),
    num_res_blocks=2, attn_resolutions=(4,),  # inactive at {32, 16}
    z_emb_dim=32, t_emb_dim=32, nz=16, n_mlp=3, num_timesteps=4,
)


def _ref_args():
    return argparse.Namespace(
        image_size=IMG, num_channels=1, centered=True,
        num_channels_dae=NF, n_mlp=3, ch_mult=[1, 2],
        num_res_blocks=2, attn_resolutions=(4,), dropout=0.0,
        resamp_with_conv=True, conditional=True, fir=True,
        fir_kernel=[1, 3, 3, 1], skip_rescale=True,
        resblock_type="biggan", progressive="none",
        progressive_input="residual", progressive_combine="sum",
        embedding_type="positional", fourier_scale=16.0,
        not_use_tanh=False, nz=16, z_emb_dim=32, t_emb_dim=32,
    )


def t2j_conv(m):
    return {
        "kernel": jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }


def t2j_dense(m):
    return {
        "kernel": jnp.asarray(m.weight.detach().numpy().T),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }


def map_resblock(m):
    return {
        "GroupNorm_0": {"style": t2j_dense(m.GroupNorm_0.style)},
        "Conv_0": {"conv": t2j_conv(m.Conv_0)},
        "Dense_0": {"dense": t2j_dense(m.Dense_0)},
        "GroupNorm_1": {"style": t2j_dense(m.GroupNorm_1.style)},
        "Conv_1": {"conv": t2j_conv(m.Conv_1)},
        **(
            {"Conv_2": {"conv": t2j_conv(m.Conv_2)}}
            if hasattr(m, "Conv_2") else {}
        ),
    }


def map_attn(m):
    return {
        "GroupNorm_0": {"GroupNorm_0": {
            "scale": jnp.asarray(m.GroupNorm_0.weight.detach().numpy()),
            "bias": jnp.asarray(m.GroupNorm_0.bias.detach().numpy()),
        }},
        **{
            f"NIN_{i}": {
                "W": jnp.asarray(getattr(m, f"NIN_{i}").W.detach().numpy()),
                "b": jnp.asarray(getattr(m, f"NIN_{i}").b.detach().numpy()),
            }
            for i in range(4)
        },
    }


def map_convfeat(m):
    return {
        "conv1": {"conv": t2j_conv(m.conv1)},
        "conv2": {"conv": t2j_conv(m.conv2)},
    }


def map_convblock(m):
    return {
        "conv1": {"conv": t2j_conv(m.conv1)},
        "group_norm": {"style": t2j_dense(m.group_norm.style)},
        "conv2": {"conv": t2j_conv(m.conv2)},
    }


def map_gap(m):
    return {
        "conv1": {"conv": t2j_conv(m.conv1)},
        "conv2": {"conv": t2j_conv(m.conv2)},
        "fc": {"dense": t2j_dense(m.fc)},
    }


def map_fir_conv2d(m):
    return {
        "weight": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0)
        ),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }


def map_z_transform(seq):
    # Sequential: [PixelNorm, dense, SiLU, dense, SiLU, dense, SiLU, dense, SiLU]
    denses = [m for m in seq if isinstance(m, torch.nn.Linear)]
    return {f"fc{i}": {"dense": t2j_dense(m)} for i, m in enumerate(denses)}


def _map_trunk(mods, i, params, num_res_blocks=2, num_levels=2):
    """Shared encoder/mid/decoder mapping; returns next module index."""
    for lvl in range(num_levels):
        for b in range(num_res_blocks):
            params[f"down_{lvl}_{b}"] = map_resblock(mods[i]); i += 1
        if lvl != num_levels - 1:
            params[f"downsample_{lvl}"] = map_resblock(mods[i]); i += 1
            # reference wraps the fused conv in a Downsample module
            params[f"pyramid_downsample_{lvl}"] = {
                "Conv2d_0": map_fir_conv2d(mods[i].Conv2d_0)
            }; i += 1
    params["mid_block1"] = map_resblock(mods[i]); i += 1
    params["mid_attn"] = map_attn(mods[i]); i += 1
    params["mid_block2"] = map_resblock(mods[i]); i += 1
    for lvl in reversed(range(num_levels)):
        for b in range(num_res_blocks + 1):
            params[f"up_{lvl}_{b}"] = map_resblock(mods[i]); i += 1
        if lvl != 0:
            params[f"upsample_{lvl}"] = map_resblock(mods[i]); i += 1
    params["final_norm"] = {"GroupNorm_0": {
        "scale": jnp.asarray(mods[i].weight.detach().numpy()),
        "bias": jnp.asarray(mods[i].bias.detach().numpy()),
    }}; i += 1
    params["final_conv"] = {"conv": t2j_conv(mods[i])}; i += 1
    return i


def test_g1_full_forward_parity():
    from backbones.ncsnpp_generator_adagn_feat import NCSNpp

    torch.manual_seed(0)
    ref = NCSNpp(_ref_args())
    ref.eval()

    mods = list(ref.all_modules)
    params = {
        "temb_dense0": {"kernel": jnp.asarray(mods[0].weight.detach().numpy().T),
                        "bias": jnp.asarray(mods[0].bias.detach().numpy())},
        "temb_dense1": {"kernel": jnp.asarray(mods[1].weight.detach().numpy().T),
                        "bias": jnp.asarray(mods[1].bias.detach().numpy())},
        "encoder_x": map_convfeat(mods[2]),
        "encoder_c1": map_convfeat(mods[3]),
        "encoder_c2": map_convfeat(mods[4]),
        "encoder_c3": map_convfeat(mods[5]),
        "z_transform": map_z_transform(ref.z_transform),
    }
    i = _map_trunk(mods, 6, params)
    assert i == len(mods), f"mapped {i} of {len(mods)} reference modules"

    rng = np.random.RandomState(0)
    x = rng.randn(2, IMG, IMG, 1).astype(np.float32)
    c1, c2, c3 = (rng.randn(2, IMG, IMG, 1).astype(np.float32) for _ in range(3))
    t = np.array([1, 3], np.int64)
    z = rng.randn(2, 16).astype(np.float32)

    nchw = lambda a: torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_out = ref(
            nchw(x), nchw(c1), nchw(c2), nchw(c3),
            torch.from_numpy(t), torch.from_numpy(z),
        ).numpy().transpose(0, 2, 3, 1)

    model = NCSNppGenerator(config=CFG)
    out = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(c1), jnp.asarray(c2),
        jnp.asarray(c3), jnp.asarray(t.astype(np.int32)), jnp.asarray(z),
    ))
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_g2_full_forward_parity():
    from backbones.ncsnpp_generator_adagn_feat import NCSNpp_adaptive

    torch.manual_seed(1)
    ref = NCSNpp_adaptive(_ref_args())
    ref.eval()

    mods = list(ref.all_modules)
    params = {
        "temb_dense0": {"kernel": jnp.asarray(mods[0].weight.detach().numpy().T),
                        "bias": jnp.asarray(mods[0].bias.detach().numpy())},
        "temb_dense1": {"kernel": jnp.asarray(mods[1].weight.detach().numpy().T),
                        "bias": jnp.asarray(mods[1].bias.detach().numpy())},
        "pseudo_gap": map_gap(mods[2]),
        "encoder_x": map_convfeat(mods[3]),
        "encoder_c1": map_convblock(mods[4]),
        "encoder_c2": map_convblock(mods[5]),
        "encoder_c3": map_convblock(mods[6]),
        "z_transform": map_z_transform(ref.z_transform),
        # cyclic fusion convs are attributes, not all_modules entries
        "feat_weight_c1": {"conv": t2j_conv(ref.feat_weight_c1)},
        "feat_weight_c2": {"conv": t2j_conv(ref.feat_weight_c2)},
        "feat_weight_c3": {"conv": t2j_conv(ref.feat_weight_c3)},
        "feat_att1_c12": {"conv": t2j_conv(ref.feat_att1_c12)},
        "feat_att2_c12": {"conv": t2j_conv(ref.feat_att2_c12)},
        "feat_att1_c23": {"conv": t2j_conv(ref.feat_att1_c23)},
        "feat_att2_c23": {"conv": t2j_conv(ref.feat_att2_c23)},
        "feat_att1_c31": {"conv": t2j_conv(ref.feat_att1_c31)},
        "feat_att2_c31": {"conv": t2j_conv(ref.feat_att2_c31)},
    }
    i = _map_trunk(mods, 7, params)
    assert i == len(mods), f"mapped {i} of {len(mods)} reference modules"

    rng = np.random.RandomState(1)
    x = rng.randn(2, IMG, IMG, 1).astype(np.float32)
    c1, c2, c3 = (rng.randn(2, IMG, IMG, 1).astype(np.float32) for _ in range(3))
    pseudo = rng.randn(2, IMG, IMG, 1).astype(np.float32)
    t = np.array([0, 2], np.int64)
    z = rng.randn(2, 16).astype(np.float32)

    nchw = lambda a: torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_out = ref(
            nchw(x), nchw(c1), nchw(c2), nchw(c3),
            torch.from_numpy(t), torch.from_numpy(z), nchw(pseudo),
        ).numpy().transpose(0, 2, 3, 1)

    model = NCSNppGenerator(config=CFG, adaptive=True)
    out = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(c1), jnp.asarray(c2),
        jnp.asarray(c3), jnp.asarray(t.astype(np.int32)), jnp.asarray(z),
        pseudo_target=jnp.asarray(pseudo),
    ))
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)
