"""Implicit-GEMM conv kernel vs the XLA lowering (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudiff_tpu.ops.pallas_conv import conv3x3_gemm, conv3x3_xla

SHAPES = [
    # (N, H, W, Cin, Cout) — down-scaled stand-ins for the census groups
    (2, 16, 16, 32, 32),    # ~64^2*C256 group
    (2, 32, 32, 16, 16),    # ~128^2*C128 group
    (1, 64, 64, 8, 8),      # ~256^2*C64 group
    (1, 8, 8, 24, 8),       # gate-style Cin != Cout
    (3, 8, 24, 8, 16),      # non-square, W not 2^k
    (1, 12, 10, 5, 7),      # ragged everything
    (1, 48, 8, 8, 8),       # H with non-power-of-2 band split
]


def _data(shape, dtype=jnp.float32, seed=0):
    n, h, w, ci, co = shape
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, ci).astype(np.float32), dtype)
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1, dtype)
    b = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    return x, k, b


@pytest.mark.parametrize("mode", ["dxn", "dxk"])
@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(shape, mode):
    x, k, b = _data(shape)
    ours = conv3x3_gemm(x, k, b, mode=mode)
    ref = conv3x3_xla(x, k, b)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_forward_no_bias():
    x, k, _ = _data(SHAPES[0])
    np.testing.assert_allclose(
        np.asarray(conv3x3_gemm(x, k)),
        np.asarray(conv3x3_xla(x, k)),
        atol=1e-4, rtol=1e-4,
    )


def test_bf16_forward_close():
    x, k, b = _data(SHAPES[1], dtype=jnp.bfloat16)
    ours = np.asarray(conv3x3_gemm(x, k, b), np.float32)
    ref = np.asarray(conv3x3_xla(x, k, b), np.float32)
    # both accumulate fp32 over bf16 products
    np.testing.assert_allclose(ours, ref, atol=0.05, rtol=0.05)


def test_gradients_match_xla():
    x, k, b = _data((2, 8, 8, 8, 8))

    def loss_ours(x, k, b):
        return jnp.sum(jnp.sin(conv3x3_gemm(x, k, b)))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(conv3x3_xla(x, k, b)))

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, k, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, r, name in zip(g_ours, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=1e-4, rtol=1e-4,
            err_msg=name,
        )


def test_jit_and_vmap_compose():
    x, k, b = _data((2, 16, 16, 8, 8))
    f = jax.jit(lambda x: conv3x3_gemm(x, k, b))
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(conv3x3_xla(x, k, b)),
        atol=1e-4, rtol=1e-4,
    )
    # vmap over a leading axis (e.g. an ensemble dim): the custom-VJP
    # op must have a working batching rule
    xs = jnp.stack([x, x * 0.5])
    vf = jax.jit(jax.vmap(lambda x: conv3x3_gemm(x, k, b)))
    ref = jnp.stack([conv3x3_xla(x, k, b), conv3x3_xla(x * 0.5, k, b)])
    np.testing.assert_allclose(
        np.asarray(vf(xs)), np.asarray(ref), atol=1e-4, rtol=1e-4,
    )


def test_overbudget_band_falls_back_to_xla(monkeypatch):
    """When no band height fits the scoped-VMEM budget (_pick_band
    returns 0), the op must route to XLA instead of launching an
    over-VMEM kernel (which faults and crashes the TPU worker)."""
    import mudiff_tpu.ops.pallas_conv as pc

    # real over-budget shape: even th=1 exceeds the 8M estimate budget
    assert pc._pick_band(64, 64, 80, 4096, 4096, 2) == 0

    monkeypatch.setattr(pc, "_pick_band", lambda *a, **k: 0)
    x, k, b = _data((2, 8, 8, 8, 8))
    np.testing.assert_allclose(
        np.asarray(pc.conv3x3_gemm(x, k, b)),
        np.asarray(pc.conv3x3_xla(x, k, b)),
        atol=1e-4, rtol=1e-4,
    )


def test_routing_rule(monkeypatch):
    """MUDIFF_GEMM_CONV=1 routes only the lane-aligned winning shapes
    from the on-chip A/B; =all routes every >=32-channel 3x3; unset
    routes nothing."""
    from mudiff_tpu.ops.pallas_conv import gemm_conv_routed

    monkeypatch.delenv("MUDIFF_GEMM_CONV", raising=False)
    assert not gemm_conv_routed(256, 256)

    monkeypatch.setenv("MUDIFF_GEMM_CONV", "1")
    assert gemm_conv_routed(256, 256)       # 64^2*C256 census group
    assert gemm_conv_routed(128, 128)       # 128^2*C128 census group
    assert gemm_conv_routed(384, 384)       # G2 gates (nf=128)
    assert not gemm_conv_routed(64, 64)     # C64 level: XLA wins
    assert not gemm_conv_routed(192, 64)    # G2 weight heads: XLA wins
    assert not gemm_conv_routed(256, 64)    # decoder skip: XLA wins
    assert not gemm_conv_routed(1, 128)     # stem: too narrow to pack

    monkeypatch.setenv("MUDIFF_GEMM_CONV", "all")
    assert gemm_conv_routed(64, 64)
    assert gemm_conv_routed(32, 32)
    assert not gemm_conv_routed(1, 32)


def test_routed_train_step_smoke(monkeypatch):
    """The routed kernel must compose with jax.grad, nn.remat and the
    full adversarial train step (custom-VJP under checkpointing)."""
    from mudiff_tpu.config import MuDiffConfig
    from mudiff_tpu.train import create_train_state, make_train_step

    # "all" routes every >=32-channel 3x3 (the selective "1" rule needs
    # production widths that would be slow on the CPU interpreter)
    monkeypatch.setenv("MUDIFF_GEMM_CONV", "all")
    cfg = MuDiffConfig(
        image_size=16, num_channels=1, num_channels_dae=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(8,), z_emb_dim=32, t_emb_dim=32,
        nz=8, ngf=8, num_timesteps=4, use_bf16=False,
        use_grad_checkpoint=True,
    )
    state, g1, g2, d = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=4
    )
    step = make_train_step(cfg, g1.apply, g2.apply, d.apply)
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32))
    state2, m = step(
        state, (mk(), mk(), mk(), mk()), jax.random.PRNGKey(1), with_r1=True
    )
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_model_routing_identical_params_and_outputs(monkeypatch):
    """Routing on (=all) must keep the generator's param tree
    byte-identical (checkpoint compatibility) and its outputs equal to
    the XLA path within fp32 tolerance."""
    from mudiff_tpu.config import MuDiffConfig
    from mudiff_tpu.models import NCSNppGenerator

    cfg = MuDiffConfig(
        image_size=32, num_channels=1, num_channels_dae=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(16,), z_emb_dim=32,
        t_emb_dim=32, nz=8, ngf=8, num_timesteps=4, use_bf16=False,
    )
    rng = np.random.RandomState(0)
    s = cfg.image_size
    x = jnp.asarray(rng.randn(2, s, s, 1).astype(np.float32) * 0.3)
    t = jnp.asarray([0, 2], jnp.int32)
    z = jnp.asarray(rng.randn(2, cfg.nz).astype(np.float32))

    outs, params_trees = [], []
    for flag in ("0", "all"):
        monkeypatch.setenv("MUDIFF_GEMM_CONV", flag)
        for adaptive in (False, True):
            model = NCSNppGenerator(config=cfg, adaptive=adaptive)
            kw = dict(pseudo_target=x) if adaptive else {}
            v = model.init(jax.random.PRNGKey(0), x, x, x, x, t, z, **kw)
            params_trees.append(
                jax.tree_util.tree_map(np.asarray, v["params"])
            )
            outs.append(np.asarray(model.apply(v, x, x, x, x, t, z, **kw)))
    monkeypatch.delenv("MUDIFF_GEMM_CONV")

    for i in (0, 1):  # g1, g2: xla vs routed
        a, b = params_trees[i], params_trees[i + 2]
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves_with_path(b)
        assert [p for p, _ in la] == [p for p, _ in lb]
        for (pa, va), (_, vb) in zip(la, lb):
            np.testing.assert_array_equal(va, vb, err_msg=str(pa))
        np.testing.assert_allclose(outs[i], outs[i + 2],
                                   atol=5e-4, rtol=5e-4)
