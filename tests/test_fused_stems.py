"""Fused stem bank: exact equivalence with per-stem ConvFeatBlocks."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu.nn.blocks import ConvFeatBlock
from mudiff_tpu.nn.fused_stems import ConvFeatParams, fused_convfeat_apply

NF = 16
N = 4


class _SepModel(nn.Module):
    """Reference composition: four independent ConvFeatBlocks."""

    @nn.compact
    def __call__(self, xs):
        names = ["encoder_x", "encoder_c1", "encoder_c2", "encoder_c3"]
        outs = [
            ConvFeatBlock(jax.nn.silu, NF, name=n)(xs[..., i:i + 1])
            for i, n in enumerate(names)
        ]
        return jnp.concatenate(outs, axis=-1)


class _FusedModel(nn.Module):
    @nn.compact
    def __call__(self, xs):
        names = ["encoder_x", "encoder_c1", "encoder_c2", "encoder_c3"]
        params = [ConvFeatParams(NF, name=n)() for n in names]
        return fused_convfeat_apply(xs, params, jax.nn.silu, jnp.float32)


def test_fused_stems_param_tree_identical():
    xs = jnp.zeros((2, 8, 8, N), jnp.float32)
    p_sep = _SepModel().init(jax.random.PRNGKey(3), xs)["params"]
    p_fused = _FusedModel().init(jax.random.PRNGKey(3), xs)["params"]
    flat_sep = jax.tree_util.tree_flatten_with_path(p_sep)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [p for p, _ in flat_sep] == [p for p, _ in flat_fused]
    # same scope paths -> same init RNG folds -> identical values
    for (_, a), (_, b) in zip(flat_sep, flat_fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_stems_outputs_equal():
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 8, 8, N).astype(np.float32))
    params = _SepModel().init(jax.random.PRNGKey(1), xs)["params"]
    # randomize further so biases/kernels are non-trivial
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * rng.randn(*a.shape).astype(a.dtype), params
    )
    out_sep = _SepModel().apply({"params": params}, xs)
    out_fused = _FusedModel().apply({"params": params}, xs)
    np.testing.assert_allclose(
        np.asarray(out_sep), np.asarray(out_fused), rtol=2e-5, atol=2e-6
    )


def test_fused_stems_gradients_equal():
    rng = np.random.RandomState(7)
    xs = jnp.asarray(rng.randn(2, 8, 8, N).astype(np.float32))
    params = _SepModel().init(jax.random.PRNGKey(1), xs)["params"]

    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, xs) ** 2)

    g_sep = jax.grad(lambda p: loss(_SepModel(), p))(params)
    g_fused = jax.grad(lambda p: loss(_FusedModel(), p))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_sep), jax.tree_util.tree_leaves(g_fused)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_grouped_lowering_equals_block_diag(monkeypatch):
    """MUDIFF_GROUPED_STEMS=g lowers the stem fusions as grouped convs
    (feature_group_count=g super-groups, g-fold fewer FLOPs); the dense
    block-diag form only adds exact-zero terms, so outputs must match to
    fp round-off for every divisor g (including non-divisors, which
    fall back to dense)."""
    rng = np.random.RandomState(3)
    xs = jnp.asarray(rng.randn(2, 8, 8, N).astype(np.float32))
    params = _SepModel().init(jax.random.PRNGKey(1), xs)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * rng.randn(*a.shape).astype(a.dtype), params
    )
    monkeypatch.delenv("MUDIFF_GROUPED_STEMS", raising=False)
    out_dense = _FusedModel().apply({"params": params}, xs)
    for g in (2, N, 3):  # 3 does not divide N=4 -> dense fallback
        monkeypatch.setenv("MUDIFF_GROUPED_STEMS", str(g))
        out_grouped = _FusedModel().apply({"params": params}, xs)
        np.testing.assert_allclose(
            np.asarray(out_dense), np.asarray(out_grouped),
            rtol=2e-5, atol=2e-6, err_msg=f"g={g}",
        )


def test_grouped_lowering_full_models(monkeypatch):
    """Both generators produce (near-)identical outputs under the
    grouped stem lowering — covers fused_convfeat_apply (G1),
    fused_adaptive_encode and fused_weight_convs (G2)."""
    from mudiff_tpu.config import MuDiffConfig
    from mudiff_tpu.models import NCSNppGenerator

    cfg = MuDiffConfig(
        image_size=16, num_channels=1, num_channels_dae=16, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(8,), z_emb_dim=32, t_emb_dim=32,
        nz=8, ngf=8, num_timesteps=2,
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32))
    t = jnp.asarray([0, 1], jnp.int32)
    z = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    for adaptive in (False, True):
        m = NCSNppGenerator(config=cfg, adaptive=adaptive,
                            dtype=jnp.float32)
        kw = {"pseudo_target": x} if adaptive else {}
        monkeypatch.delenv("MUDIFF_GROUPED_STEMS", raising=False)
        p = m.init(jax.random.PRNGKey(0), x, x, x, x, t, z, **kw)["params"]
        y_dense = np.asarray(
            m.apply({"params": p}, x, x, x, x, t, z, **kw), np.float32
        )
        for g in (2, 4):
            monkeypatch.setenv("MUDIFF_GROUPED_STEMS", str(g))
            y_grouped = np.asarray(
                m.apply({"params": p}, x, x, x, x, t, z, **kw), np.float32
            )
            np.testing.assert_allclose(y_dense, y_grouped, rtol=1e-4,
                                       atol=1e-5, err_msg=f"g={g}")
