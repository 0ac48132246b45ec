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
