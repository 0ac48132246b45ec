"""Model parity tests: parameter counts and output shapes.

Reference parameter counts at nf=64 are the shipped training log's
"[MODEL]" line (/root/reference/error_logs/log_mudiff_t2.13966160.out):
G1 20,472,065 / G2 21,399,681 / D 27,736,705 — i.e. the shipped logs ran
the README width num_channels_dae=64, not the YAML's 128 (a documented
reference footgun).  The nf=128 counts (G1 72,759,809 / G2 76,236,801)
were obtained by instantiating the reference torch models directly during
development.  Exact count matches at both widths pin the whole
architecture graph (ch_mult [1,2,4], num_res_blocks 2, z/t_emb 256,
nz 100, ngf 64, attn inactive as at 256^2 with attn_resolutions (16,)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudiff_tpu.config import MuDiffConfig, brats_recipe
from mudiff_tpu.models import DiscriminatorLarge, NCSNppGenerator


def _count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# Param counts don't depend on image size as long as the resolution set
# keeps attention inactive, so init at 32^2 for speed with a sentinel
# attn resolution that never fires (matching 256^2 + (16,)).
CFG = brats_recipe(image_size=32, attn_resolutions=(5,), num_channels_dae=64)


@pytest.fixture(scope="module")
def small_inputs():
    b = 2
    x = jnp.zeros((b, 32, 32, 1))
    t = jnp.zeros((b,), jnp.int32)
    z = jnp.zeros((b, CFG.nz))
    return x, t, z


@pytest.fixture(scope="module")
def g1_vars(small_inputs):
    x, t, z = small_inputs
    model = NCSNppGenerator(config=CFG)
    return model.init(jax.random.PRNGKey(0), x, x, x, x, t, z)


@pytest.fixture(scope="module")
def g2_vars(small_inputs):
    x, t, z = small_inputs
    model = NCSNppGenerator(config=CFG, adaptive=True)
    return model.init(
        jax.random.PRNGKey(0), x, x, x, x, t, z, pseudo_target=x
    )


def test_g1_param_count(g1_vars):
    assert _count(g1_vars["params"]) == 20_472_065


def test_g2_param_count(g2_vars):
    assert _count(g2_vars["params"]) == 21_399_681


def test_param_counts_nf128():
    """The YAML-recipe width (num_channels_dae=128)."""
    cfg = brats_recipe(image_size=16, attn_resolutions=(5,))
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, cfg.nz))
    v1 = NCSNppGenerator(config=cfg).init(
        jax.random.PRNGKey(0), x, x, x, x, t, z
    )
    assert _count(v1["params"]) == 72_759_809
    v2 = NCSNppGenerator(config=cfg, adaptive=True).init(
        jax.random.PRNGKey(0), x, x, x, x, t, z, pseudo_target=x
    )
    assert _count(v2["params"]) == 76_236_801


def test_critic_param_count(small_inputs):
    x, t, _ = small_inputs
    model = DiscriminatorLarge(ngf=64, t_emb_dim=256)
    variables = model.init(jax.random.PRNGKey(0), x, t, x)
    assert _count(variables["params"]) == 27_736_705


def test_g1_forward_shape_and_range(g1_vars, small_inputs):
    x, t, z = small_inputs
    model = NCSNppGenerator(config=CFG)
    out = model.apply(g1_vars, x, x, x, x, t, z)
    assert out.shape == (2, 32, 32, 1)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh head


def test_g2_forward_shape(g2_vars, small_inputs):
    x, t, z = small_inputs
    model = NCSNppGenerator(config=CFG, adaptive=True)
    out = model.apply(g2_vars, x, x, x, x, t, z, pseudo_target=x)
    assert out.shape == (2, 32, 32, 1)


def test_critic_forward_shapes(small_inputs):
    x, t, _ = small_inputs
    model = DiscriminatorLarge(ngf=64, t_emb_dim=256)
    variables = model.init(jax.random.PRNGKey(0), x, t, x)
    logit, mid = model.apply(variables, x, t, x)
    assert logit.shape == (2,)
    # mid_feat is after 3 of 6 downsamples: 32/8 = 4, ngf*8 channels
    assert mid.shape == (2, 4, 4, 512)


def test_attention_fires_at_configured_resolution():
    """With image_size 32 and attn at 16, encoder/decoder attention blocks
    must appear (and change the parameter count)."""
    cfg_attn = brats_recipe(image_size=32, attn_resolutions=(16,))
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, cfg_attn.nz))
    model = NCSNppGenerator(config=cfg_attn)
    v = model.init(jax.random.PRNGKey(0), x, x, x, x, t, z)
    names = jax.tree_util.tree_structure(v["params"]).unflatten(
        range(len(jax.tree_util.tree_leaves(v["params"])))
    )
    keys = set(v["params"].keys())
    assert any(k.startswith("down_attn_") for k in keys)
    assert any(k.startswith("up_attn_") for k in keys)
    assert _count(v["params"]) > 20_472_065  # nf=64 base


def test_generator_bf16_compute():
    """bf16 compute dtype must produce finite outputs with fp32 params."""
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, CFG.nz))
    model = NCSNppGenerator(config=CFG, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), x, x, x, x, t, z)
    leaf = jax.tree_util.tree_leaves(v["params"])[0]
    assert leaf.dtype == jnp.float32
    out = model.apply(v, x, x, x, x, t, z)
    assert out.dtype == jnp.float32  # head casts back
    assert np.isfinite(np.asarray(out)).all()


def test_healthy_two_condition_variant_param_counts():
    """The 2-condition ("healthy") variant: reference counts obtained by
    instantiating backbones/ncsnpp_generator_adagn_feat_healthy.py at
    nf=64 during development: G1 20,286,785 / G2 20,443,585."""
    cfg = brats_recipe(
        image_size=32, attn_resolutions=(5,), num_channels_dae=64
    )
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, cfg.nz))
    m1 = NCSNppGenerator(config=cfg, num_conditions=2)
    v1 = m1.init(jax.random.PRNGKey(0), x, x, x, time_cond=t, z=z)
    assert _count(v1["params"]) == 20_286_785
    out = m1.apply(v1, x, x, x, time_cond=t, z=z)
    assert out.shape == (1, 32, 32, 1)
    m2 = NCSNppGenerator(config=cfg, adaptive=True, num_conditions=2)
    v2 = m2.init(
        jax.random.PRNGKey(0), x, x, x, time_cond=t, z=z, pseudo_target=x
    )
    assert _count(v2["params"]) == 20_443_585


def test_discriminator_small_forward():
    from mudiff_tpu.models import DiscriminatorSmall

    x = jnp.zeros((4, 32, 32, 3))
    t = jnp.zeros((4,), jnp.int32)
    model = DiscriminatorSmall(ngf=8, t_emb_dim=16)
    v = model.init(jax.random.PRNGKey(0), x, t, x)
    out = model.apply(v, x, t, x)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_img_large_forward_and_ref_count():
    """SURVEY §2.3 row 24 (dead code in the reference, and broken there:
    start_conv is built for nc channels but fed 2*nc — see critic.py).
    Pin our param count against the torch constructor (which is
    buildable even though its forward crashes)."""
    from mudiff_tpu.models import DiscriminatorImgLarge

    x = jnp.zeros((4, 64, 64, 1))
    t = jnp.zeros((4,), jnp.int32)
    model = DiscriminatorImgLarge(ngf=32, t_emb_dim=128)
    v = model.init(jax.random.PRNGKey(0), x, t, x)
    out = model.apply(v, x, t, x)
    assert out.shape == (4,)
    assert np.isfinite(np.asarray(out)).all()

    import os
    import sys
    ref = "/root/reference"
    if not os.path.isdir(os.path.join(ref, "backbones")):
        return
    if ref not in sys.path:
        sys.path.insert(0, ref)
    try:
        import torch  # noqa: F401
        from backbones.discriminator import Discriminator_img_large
    except Exception:
        return
    tm = Discriminator_img_large(nc=1, ngf=32, t_emb_dim=128)
    ref_n = sum(p.numel() for p in tm.parameters())
    # our start_conv takes the 2-channel cat (the reference's evident
    # intent; its own ctor builds a 1-channel conv that cannot run) —
    # difference = one extra input channel on the 1x1 start conv
    ours_n = _count(v["params"])
    assert ours_n == ref_n + 32 * 2  # +ngf*2 kernel elements for the extra channel


def _ref_count_or_none(progressive, progressive_input, embedding_type,
                       fourier_scale=16.0):
    """Total param count of the torch reference at a small config, or
    None when the reference checkout / torch is unavailable."""
    import os
    import sys
    try:
        import torch
    except ImportError:
        return None
    if not os.path.isdir("/root/reference/backbones"):
        return None
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import argparse

    from backbones.ncsnpp_generator_adagn_feat import NCSNpp

    args = argparse.Namespace(
        image_size=32, num_channels=1, centered=True, num_channels_dae=16,
        n_mlp=3, ch_mult=[1, 2], num_res_blocks=2, attn_resolutions=(4,),
        dropout=0.0, resamp_with_conv=True, conditional=True, fir=True,
        fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
        progressive=progressive, progressive_input=progressive_input,
        progressive_combine="sum", embedding_type=embedding_type,
        fourier_scale=fourier_scale, not_use_tanh=False, nz=16,
        z_emb_dim=32, t_emb_dim=32,
    )
    torch.manual_seed(0)
    ref = NCSNpp(args)
    return sum(p.numel() for p in ref.parameters())


@pytest.mark.parametrize(
    "progressive,progressive_input,embedding",
    [
        ("output_skip", "input_skip", "positional"),
        ("output_skip", "residual", "positional"),
        ("none", "input_skip", "positional"),
        ("none", "residual", "fourier"),
    ],
)
def test_progressive_and_fourier_branches(progressive, progressive_input,
                                          embedding):
    """The generator branches the shipped config never exercises
    (VERDICT round 1, weak #7): output_skip / input_skip pyramids and
    the Fourier time embedding.  Checks forward shape/finiteness and —
    when the torch reference is importable — the exact parameter count
    of the same configuration."""
    cfg = MuDiffConfig(
        image_size=32, num_channels=1, num_channels_dae=16, ch_mult=(1, 2),
        num_res_blocks=2, attn_resolutions=(4,), z_emb_dim=32, t_emb_dim=32,
        nz=16, n_mlp=3, num_timesteps=4, progressive=progressive,
        progressive_input=progressive_input, progressive_combine="sum",
        embedding_type=embedding,
    )
    model = NCSNppGenerator(config=cfg)
    b = 2
    x = jnp.zeros((b, 32, 32, 1))
    t = jnp.ones((b,), jnp.int32)
    z = jnp.zeros((b, cfg.nz))
    variables = model.init(jax.random.PRNGKey(0), x, x, x, x, t, z)
    out = model.apply(variables, x, x, x, x, t, z)
    assert out.shape == (b, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()

    ref_n = _ref_count_or_none(progressive, progressive_input, embedding)
    if ref_n is not None:
        ours = _count(variables["params"])
        assert ours == ref_n, (
            f"param count {ours} != reference {ref_n} for "
            f"progressive={progressive} input={progressive_input} "
            f"embedding={embedding}"
        )


@pytest.mark.parametrize("adaptive", [False, True])
def test_multichannel_config_runs(adaptive):
    """num_channels > 1 falls back from the 1-channel block-diagonal
    fused stems to the per-stem mirror modules (same param tree)."""
    from mudiff_tpu.config import brats_recipe

    cfg = brats_recipe(
        image_size=32, num_channels=3, num_channels_dae=16, ch_mult=(1, 2),
        attn_resolutions=(8,), num_res_blocks=1, nz=8, ngf=8,
        z_emb_dim=32, t_emb_dim=32, num_timesteps=2, use_bf16=False,
    )
    g = NCSNppGenerator(config=cfg, adaptive=adaptive)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.zeros((2,), jnp.int32)
    z = jnp.zeros((2, cfg.nz))
    kw = dict(pseudo_target=x) if adaptive else {}
    p = g.init(jax.random.PRNGKey(0), x, x, x, x, t, z, **kw)["params"]
    out = g.apply({"params": p}, x, x, x, x, t, z, **kw)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_attn_impl_variants(monkeypatch):
    """MUDIFF_ATTN lowerings: identical param tree, bf16 variant close to
    the exact fp32 path, flash falls back to exact on the CPU backend."""
    import jax
    import jax.numpy as jnp

    from mudiff_tpu.nn.blocks import AttnBlockpp

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    m = AttnBlockpp(skip_rescale=True, dtype=jnp.float32)
    monkeypatch.delenv("MUDIFF_ATTN", raising=False)
    p = m.init(jax.random.PRNGKey(0), x)
    y_exact = np.asarray(m.apply(p, x), np.float32)

    monkeypatch.setenv("MUDIFF_ATTN", "bf16")
    p_b = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_b)
    y_bf16 = np.asarray(m.apply(p, x), np.float32)
    assert not np.array_equal(y_exact, y_bf16)
    # bf16 scores shift the softmax by O(2^-8) relative — output stays close
    scale = np.abs(y_exact).max()
    assert np.abs(y_exact - y_bf16).max() <= 0.02 * scale

    monkeypatch.setenv("MUDIFF_ATTN", "flash")
    if jax.default_backend() == "cpu":
        y_flash = np.asarray(m.apply(p, x), np.float32)
        np.testing.assert_array_equal(y_exact, y_flash)
