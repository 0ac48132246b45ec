"""int8 W8A8 serving-path tests (ops/int8_conv.py, nn/layers._Int8Conv).

The quantized mode must (a) leave the param tree bit-identical so any
bf16-trained checkpoint serves quantized, (b) stay numerically close to
the fp32 conv at the quantization error bound, (c) route ONLY the
trunk shapes (Cin/Cout >= 64) and only under an enabled scope, and
(d) be ignored during training (train=True keeps bf16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudiff_tpu.ops.int8_conv import (
    int8_conv3x3,
    int8_conv_routed,
    int8_enabled,
    int8_scope,
    quantize_activation,
    quantize_weight,
)


def _ref_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 64, 128).astype(np.float32))
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (1, 1, 1, 128)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(scale) - w)
    # symmetric round-to-nearest: error <= scale/2 per channel
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()
    # per-channel absmax hits 127 exactly
    assert np.abs(np.asarray(wq)).max(axis=(0, 1, 2)).min() == 127


def test_quantize_activation_per_example():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 8, 8, 16).astype(np.float32)
    x[2] *= 100.0  # an outlier example must not affect the others
    xq, scale = quantize_activation(jnp.asarray(x))
    assert xq.dtype == jnp.int8 and scale.shape == (4, 1, 1, 1)
    x_hat = np.asarray(xq, np.float32) * np.asarray(scale)
    for b in range(4):
        err = np.abs(x_hat[b] - x[b]).max()
        assert err <= np.asarray(scale)[b, 0, 0, 0] / 2 + 1e-6, b


def test_int8_conv3x3_close_to_fp32():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ref = np.asarray(_ref_conv(x, w, b))
    out = np.asarray(
        int8_conv3x3(x, w, b, compute_dtype=jnp.float32), np.float32
    )
    # w8a8 error bound: N(0,1) inputs are the adversarial case for
    # per-example scales (measured 1.3% of the output range on CPU);
    # in-model activations are GroupNorm-bounded and land far lower
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 0.02 * scale


def test_scope_is_scoped_and_restored():
    assert not int8_enabled()
    with int8_scope(True):
        assert int8_enabled()
        with int8_scope(False):
            assert not int8_enabled()
        assert int8_enabled()
    assert not int8_enabled()
    with pytest.raises(RuntimeError):
        with int8_scope(True):
            raise RuntimeError("x")
    assert not int8_enabled()  # restored on exceptions too


def test_routing_band():
    assert int8_conv_routed(64, 64)
    assert int8_conv_routed(256, 256)
    assert not int8_conv_routed(1, 64)    # stems
    assert not int8_conv_routed(64, 1)    # head
    assert not int8_conv_routed(32, 32)


def test_routing_threshold_env(monkeypatch):
    monkeypatch.setenv("MUDIFF_INT8_MIN_CH", "128")
    assert not int8_conv_routed(64, 64)   # 256^2*C64 group excluded
    assert not int8_conv_routed(64, 128)
    assert int8_conv_routed(128, 128)
    assert int8_conv_routed(256, 256)
    monkeypatch.delenv("MUDIFF_INT8_MIN_CH")
    assert int8_conv_routed(64, 64)       # default band restored


def test_routing_threshold_scope(monkeypatch):
    # the generator threads min_ch = max(64, 2*nf) through int8_scope
    with int8_scope(True, min_ch=128):
        assert not int8_conv_routed(64, 64)
        assert int8_conv_routed(128, 128)
        with int8_scope(True, min_ch=256):
            assert not int8_conv_routed(128, 128)
            assert int8_conv_routed(256, 256)
        assert int8_conv_routed(128, 128)  # restored on exit
    assert int8_conv_routed(64, 64)        # module default (64) outside
    # env force-override beats the scope threshold (A/B tooling)
    monkeypatch.setenv("MUDIFF_INT8_MIN_CH", "256")
    with int8_scope(True, min_ch=64):
        assert not int8_conv_routed(128, 128)
        assert int8_conv_routed(256, 256)


def test_routing_cout_min_env(monkeypatch):
    """MUDIFF_INT8_COUT_MIN relaxes only the output-channel threshold:
    the decoder's wide-cin -> nf full-res convs (320->64 etc.) become
    eligible while thin-INPUT convs and the nf->1 head stay bf16."""
    monkeypatch.setenv("MUDIFF_INT8_MIN_CH", "128")
    assert not int8_conv_routed(320, 64)      # symmetric rule
    monkeypatch.setenv("MUDIFF_INT8_COUT_MIN", "64")
    assert int8_conv_routed(320, 64)          # wide-cin decoder convs
    assert int8_conv_routed(128, 64)
    assert not int8_conv_routed(64, 64)       # cin keeps full threshold
    assert not int8_conv_routed(320, 1)       # head never quantizes
    monkeypatch.setenv("MUDIFF_INT8_COUT_MIN", "1")
    assert not int8_conv_routed(320, 1)       # floor guards the head
    monkeypatch.delenv("MUDIFF_INT8_COUT_MIN")
    assert not int8_conv_routed(320, 64)      # symmetric rule restored


def test_stems_int8_env(monkeypatch):
    """The fused stem conv2 routes through int8 under the scope by
    default (round-5 promotion: +2.0% end-to-end, quality-gated);
    MUDIFF_INT8_STEMS=0 steps back to the exact round-4 routing."""
    from mudiff_tpu.nn.fused_stems import fused_convfeat_apply

    rng = np.random.RandomState(11)
    f, n = 32, 4  # stacked conv2 is 128->128: routed at the default 64
    params = [
        (
            jnp.asarray(rng.randn(3, 3, 1, f).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(3, 3, f, f).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
        )
        for _ in range(n)
    ]
    stacked = jnp.asarray(rng.randn(1, 8, 8, n).astype(np.float32))
    act = jax.nn.silu

    import flax.linen as nn

    class _M(nn.Module):  # GroupNorm needs a module context (param-free)
        @nn.compact
        def __call__(self, s):
            return fused_convfeat_apply(s, params, act, jnp.float32)

    m = _M()
    pv = m.init(jax.random.PRNGKey(0), stacked)
    run = lambda: np.asarray(m.apply(pv, stacked))

    monkeypatch.delenv("MUDIFF_INT8_STEMS", raising=False)
    y_exact = run()
    monkeypatch.setenv("MUDIFF_INT8_STEMS", "0")
    with int8_scope(True):
        y_off = run()
    assert np.array_equal(y_exact, y_off)  # opt-out restores round-4 exact
    monkeypatch.delenv("MUDIFF_INT8_STEMS", raising=False)
    with int8_scope(True):
        y_q = run()
    assert not np.array_equal(y_exact, y_q)  # default quantizes
    scale = np.abs(y_exact).max() + 1e-9
    assert np.abs(y_q - y_exact).max() <= 0.02 * scale
    # outside the scope the default must not quantize
    assert np.array_equal(y_exact, run())


def test_conv3x3_param_tree_identical_and_routed():
    from mudiff_tpu.nn.layers import Conv3x3

    x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 8, 64), jnp.float32)
    m = Conv3x3(features=64, dtype=jnp.float32)
    p_off = m.init(jax.random.PRNGKey(0), x)
    with int8_scope(True):
        p_on = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_off) == (
        jax.tree_util.tree_structure(p_on)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_off), jax.tree_util.tree_leaves(p_on)
    ):
        assert a.dtype == b.dtype and (np.asarray(a) == np.asarray(b)).all()
    y_off = m.apply(p_off, x)
    with int8_scope(True):
        y_on = m.apply(p_off, x)
    # routed: quantized output differs from exact but stays close
    assert not np.array_equal(np.asarray(y_on), np.asarray(y_off))
    scale = np.abs(np.asarray(y_off)).max() + 1e-9
    assert np.abs(np.asarray(y_on) - np.asarray(y_off)).max() <= 0.02 * scale

    # ineligible shape (Cin=1): int8 scope must not change the lowering
    x1 = jnp.ones((1, 8, 8, 1), jnp.float32)
    m1 = Conv3x3(features=64, dtype=jnp.float32)
    p1 = m1.init(jax.random.PRNGKey(1), x1)
    with int8_scope(True):
        y1_on = m1.apply(p1, x1)
    assert np.array_equal(np.asarray(m1.apply(p1, x1)), np.asarray(y1_on))


def test_fused_gate_weight_convs_route_int8():
    """The G2 cyclic-fusion gate/weight convs (fused_stems._conv with
    allow_int8=True) take the int8 path under the scope; the stem convs
    (allow_int8 default False) never do."""
    from mudiff_tpu.nn.fused_stems import (
        _conv,
        fused_gate_convs,
        fused_weight_convs,
    )

    rng = np.random.RandomState(6)
    nf = 64
    allc = jnp.asarray(rng.randn(1, 8, 8, 3 * nf).astype(np.float32) * 0.3)
    gp = [
        (
            jnp.asarray(rng.randn(3, 3, 3 * nf, nf).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(nf).astype(np.float32) * 0.1),
        )
        for _ in range(2)
    ]
    g_off = fused_gate_convs(allc, gp, jnp.float32)
    with int8_scope(True):
        g_on = fused_gate_convs(allc, gp, jnp.float32)
    assert not np.array_equal(np.asarray(g_off[0]), np.asarray(g_on[0]))
    for a, b in zip(g_off, g_on):  # sigmoided gates stay close
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 0.01

    wp = [
        (
            jnp.asarray(rng.randn(3, 3, nf, nf).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(nf).astype(np.float32) * 0.1),
        )
        for _ in range(3)
    ]
    ins = [
        jnp.asarray(rng.randn(1, 8, 8, nf).astype(np.float32) * 0.3)
        for _ in range(3)
    ]
    w_off = fused_weight_convs(ins, wp, jnp.float32)
    with int8_scope(True):
        w_on = fused_weight_convs(ins, wp, jnp.float32)
    assert not np.array_equal(np.asarray(w_off[0]), np.asarray(w_on[0]))
    ref_scale = max(np.abs(np.asarray(o)).max() for o in w_off)
    for a, b in zip(w_off, w_on):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 0.02 * ref_scale

    # default allow_int8=False: identical lowering under the scope
    k = jnp.asarray(rng.randn(3, 3, nf, nf).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(nf).astype(np.float32))
    y_off = _conv(ins[0], k, b, jnp.float32)
    with int8_scope(True):
        y_on = _conv(ins[0], k, b, jnp.float32)
    assert np.array_equal(np.asarray(y_off), np.asarray(y_on))


@pytest.fixture(scope="module")
def tiny_cfg_pair():
    from mudiff_tpu.config import brats_recipe

    mk = lambda **kw: brats_recipe(
        num_channels_dae=64, image_size=16, ch_mult=(1, 2),
        attn_resolutions=(8,), num_res_blocks=1, use_bf16=False, **kw
    )
    return mk(), mk(use_int8=True)


def test_generator_int8_mode(tiny_cfg_pair):
    """use_int8 config: same params, close outputs, train=True exempt."""
    from mudiff_tpu.models import NCSNppGenerator

    cfg0, cfg8 = tiny_cfg_pair
    s = cfg0.image_size
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, s, s, 1).astype(np.float32) * 0.3)
    t = jnp.asarray([0, 2], jnp.int32)
    z = jnp.asarray(rng.randn(2, cfg0.nz).astype(np.float32))

    g0 = NCSNppGenerator(config=cfg0)
    g8 = NCSNppGenerator(config=cfg8)
    p0 = g0.init(jax.random.PRNGKey(0), x, x, x, x, t, z)["params"]
    p8 = g8.init(jax.random.PRNGKey(0), x, x, x, x, t, z)["params"]
    assert jax.tree_util.tree_structure(p0) == (
        jax.tree_util.tree_structure(p8)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p8)
    ):
        assert (np.asarray(a) == np.asarray(b)).all()

    y0 = np.asarray(g0.apply({"params": p0}, x, x, x, x, t, z), np.float32)
    y8 = np.asarray(g8.apply({"params": p0}, x, x, x, x, t, z), np.float32)
    assert np.isfinite(y8).all()
    assert not np.array_equal(y0, y8)  # int8 path actually taken
    # tanh-bounded outputs: quantization error stays small end-to-end
    assert np.abs(y0 - y8).max() <= 0.1

    # train=True must force the exact bf16/fp32 path even with use_int8
    yt0 = np.asarray(
        g0.apply({"params": p0}, x, x, x, x, t, z, train=True,
                 rngs={"dropout": jax.random.PRNGKey(7)}),
        np.float32,
    )
    yt8 = np.asarray(
        g8.apply({"params": p0}, x, x, x, x, t, z, train=True,
                 rngs={"dropout": jax.random.PRNGKey(7)}),
        np.float32,
    )
    assert np.array_equal(yt0, yt8)


def test_adaptive_generator_int8_mode(tiny_cfg_pair):
    from mudiff_tpu.models import NCSNppGenerator

    cfg0, cfg8 = tiny_cfg_pair
    s = cfg0.image_size
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, s, s, 1).astype(np.float32) * 0.3)
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.asarray(rng.randn(1, cfg0.nz).astype(np.float32))

    ga0 = NCSNppGenerator(config=cfg0, adaptive=True)
    ga8 = NCSNppGenerator(config=cfg8, adaptive=True)
    pa = ga0.init(
        jax.random.PRNGKey(1), x, x, x, x, t, z, pseudo_target=x
    )["params"]
    y0 = np.asarray(
        ga0.apply({"params": pa}, x, x, x, x, t, z, pseudo_target=x),
        np.float32,
    )
    y8 = np.asarray(
        ga8.apply({"params": pa}, x, x, x, x, t, z, pseudo_target=x),
        np.float32,
    )
    assert np.isfinite(y8).all()
    assert not np.array_equal(y0, y8)
    assert np.abs(y0 - y8).max() <= 0.1


# ---------------------------------------------------------------------------
# static (calibrated) activation scales — round 4
# ---------------------------------------------------------------------------


def test_record_scope_collects_sites():
    from mudiff_tpu.ops.int8_conv import record_scope

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 128).astype(np.float32) * 0.05)
    sink = []
    with int8_scope(True), record_scope(sink):
        int8_conv3x3(x, w, None, compute_dtype=jnp.float32)
        int8_conv3x3(
            jnp.concatenate([x, x], -1),
            jnp.asarray(rng.randn(3, 3, 128, 64).astype(np.float32) * 0.05),
            None, compute_dtype=jnp.float32,
        )
    assert [(s[0], s[1]) for s in sink] == [(64, 128), (128, 64)]
    # per-channel absmax over (B, H, W)
    np.testing.assert_allclose(
        np.asarray(sink[0][2]), np.abs(np.asarray(x)).max(axis=(0, 1, 2)),
        rtol=1e-6,
    )


def test_static_int8_conv_matches_and_beats_dynamic_on_skewed_channels():
    """Static per-channel scales: (a) close to the exact conv, (b) lower
    error than dynamic per-example scales when channel ranges are skewed
    (the GroupNorm'd-activation case the scheme is built for)."""
    from mudiff_tpu.ops.int8_conv import Int8Calib

    rng = np.random.RandomState(8)
    x = rng.randn(2, 16, 16, 64).astype(np.float32)
    x *= np.logspace(-2, 1, 64, dtype=np.float32)  # skewed channel ranges
    xj = jnp.asarray(x)
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ref = np.asarray(_ref_conv(xj, w, b))

    absmax_c = tuple(float(v) for v in np.abs(x).max(axis=(0, 1, 2)))
    calib = Int8Calib(min_ch=64, sites=((64, 64, absmax_c),))
    with int8_scope(True, calib=calib):
        y_static = np.asarray(
            int8_conv3x3(xj, w, b, compute_dtype=jnp.float32), np.float32
        )
    y_dyn = np.asarray(
        int8_conv3x3(xj, w, b, compute_dtype=jnp.float32), np.float32
    )
    scale = np.abs(ref).max()
    err_static = np.abs(y_static - ref).max()
    err_dyn = np.abs(y_dyn - ref).max()
    assert err_static <= 0.02 * scale
    assert err_static < err_dyn  # per-channel grid wins on skewed ranges


def test_static_calib_drift_raises():
    from mudiff_tpu.ops.int8_conv import Int8Calib

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 8, 8, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    # wrong signature
    calib = Int8Calib(min_ch=64, sites=((128, 64, tuple([1.0] * 128)),))
    with int8_scope(True, calib=calib):
        with pytest.raises(ValueError, match="drift"):
            int8_conv3x3(x, w, None, compute_dtype=jnp.float32)
    # too few sites
    calib2 = Int8Calib(min_ch=64, sites=())
    with int8_scope(True, calib=calib2):
        with pytest.raises(ValueError, match="site"):
            int8_conv3x3(x, w, None, compute_dtype=jnp.float32)


def test_calib_json_roundtrip(tmp_path):
    from mudiff_tpu.infer.calibrate import load_calib, save_calib
    from mudiff_tpu.ops.int8_conv import Int8Calib

    calib = Int8Calib(
        min_ch=128,
        sites=((64, 128, (1.0, 2.5)), (128, 64, (0.25,))),
    )
    p = save_calib(str(tmp_path / "c.json"), calib)
    assert load_calib(p) == calib
    # the stems-routing bit survives the sidecar
    calib_s = calib._replace(stems=True)
    p2 = save_calib(str(tmp_path / "cs.json"), calib_s)
    assert load_calib(p2) == calib_s and load_calib(p2).stems
    # version-1 sidecars (no "stems" key) imply stems-off recording
    import json as _json

    d = calib.to_json_dict()
    del d["stems"]
    d["version"] = 1
    (tmp_path / "v1.json").write_text(_json.dumps(d))
    assert load_calib(str(tmp_path / "v1.json")).stems is False


def test_calib_stems_bit_replayed_at_serving(monkeypatch):
    """The calibration's recorded stems bit decides the serving-time
    stems routing (the site list depends on it); the env var remains
    the explicit A/B override in both directions."""
    from mudiff_tpu.nn.fused_stems import stems_int8
    from mudiff_tpu.ops.int8_conv import Int8Calib

    monkeypatch.delenv("MUDIFF_INT8_STEMS", raising=False)
    assert stems_int8() is True               # shipped default (round 5)
    calib_on = Int8Calib(min_ch=64, sites=(), stems=True)
    calib_off = Int8Calib(min_ch=64, sites=(), stems=False)
    with int8_scope(True, calib=calib_on):
        assert stems_int8() is True           # replayed from the calib
    with int8_scope(True, calib=calib_off):
        # a round-4 sidecar (stems off) must be replayed as recorded
        assert stems_int8() is False
    monkeypatch.setenv("MUDIFF_INT8_STEMS", "0")
    with int8_scope(True, calib=calib_on):
        assert stems_int8() is False          # env beats the calib
    monkeypatch.setenv("MUDIFF_INT8_STEMS", "1")
    with int8_scope(True, calib=calib_off):
        assert stems_int8() is True


def test_calibrate_records_stems_bit(tiny_cfg_pair, monkeypatch):
    """synthetic_calib (and calibrate_sampler, same code path) stamp
    the ambient stems routing into the calibration, and the stems site
    appears in the site list exactly when the bit is on."""
    from mudiff_tpu.infer.calibrate import synthetic_calib
    from mudiff_tpu.models import NCSNppGenerator

    _, cfg8 = tiny_cfg_pair
    s = cfg8.image_size
    x = jnp.zeros((1, s, s, 1), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, cfg8.nz), jnp.float32)
    g1 = NCSNppGenerator(config=cfg8)
    p1 = g1.init(jax.random.PRNGKey(0), x, x, x, x, t, z)["params"]

    monkeypatch.setenv("MUDIFF_INT8_STEMS", "0")
    c_off = synthetic_calib(g1, p1, (x, x, x, x, t, z))
    assert c_off.stems is False
    monkeypatch.delenv("MUDIFF_INT8_STEMS", raising=False)
    c_on = synthetic_calib(g1, p1, (x, x, x, x, t, z))
    assert c_on.stems is True                 # round-5 default records on
    # exactly one extra routed site: the fused stem conv2 (4nf -> 4nf)
    assert len(c_on.sites) == len(c_off.sites) + 1
    nf4 = 4 * cfg8.num_channels_dae
    extra = set(
        (ci, co) for ci, co, _ in c_on.sites
    ) - set((ci, co) for ci, co, _ in c_off.sites)
    assert extra == {(nf4, nf4)}
    # serving each calib traces cleanly (site counts line up)
    monkeypatch.delenv("MUDIFF_INT8_STEMS", raising=False)
    for c in (c_off, c_on):
        gs = NCSNppGenerator(config=cfg8, int8_calib=c)
        y = np.asarray(
            gs.apply({"params": p1}, x, x, x, x, t, z), np.float32
        )
        assert np.isfinite(y).all()


def test_flagship_routing_site_counts(monkeypatch):
    """Pin the shipped flagship64 routing: 30 G1 / 32 G2 int8 sites at
    min_ch=128 with the round-5 stems default (29/31 with
    MUDIFF_INT8_STEMS=0 — the round-4 routing).  Site lists depend on
    the channel architecture only, so a 32² trace pins the same list
    the 256² serving path uses; everything runs through jax.eval_shape
    (abstract — no compile, sub-second on CPU)."""
    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.infer.calibrate import synthetic_calib
    from mudiff_tpu.models import NCSNppGenerator

    cfg = brats_recipe(
        num_channels_dae=64, image_size=32, use_bf16=True, use_int8=True
    )
    s = cfg.image_size
    x = jnp.zeros((1, s, s, 1), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, cfg.nz), jnp.float32)
    g1 = NCSNppGenerator(config=cfg, dtype=jnp.bfloat16)
    g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=jnp.bfloat16)
    p1 = jax.eval_shape(
        lambda k: g1.init(k, x, x, x, x, t, z), jax.random.PRNGKey(0)
    )["params"]
    p2 = jax.eval_shape(
        lambda k: g2.init(k, x, x, x, x, t, z, pseudo_target=x),
        jax.random.PRNGKey(1),
    )["params"]

    counts = {}
    for env, key in (("0", "r4"), (None, "r5")):
        if env is None:
            monkeypatch.delenv("MUDIFF_INT8_STEMS", raising=False)
        else:
            monkeypatch.setenv("MUDIFF_INT8_STEMS", env)
        c1 = synthetic_calib(g1, p1, (x, x, x, x, t, z))
        c2 = synthetic_calib(g2, p2, (x, x, x, x, t, z), pseudo_target=x)
        assert c1.min_ch == 128 and c2.min_ch == 128
        counts[key] = (len(c1.sites), len(c2.sites))
    assert counts["r4"] == (29, 31)   # round-4 routing (stems opt-out)
    assert counts["r5"] == (30, 32)   # shipped default (stems quantized)


def test_calibrate_sampler_end_to_end(tiny_cfg_pair):
    """Record -> build Int8Calib -> serve statically: the calibrated
    generators must stay close to the exact model AND to the dynamic
    int8 model, and the calibration must carry one site per routed conv
    for both generators."""
    from mudiff_tpu.diffusion import PosteriorCoefficients
    from mudiff_tpu.infer.calibrate import calibrate_sampler
    from mudiff_tpu.models import NCSNppGenerator

    cfg0, cfg8 = tiny_cfg_pair
    s = cfg0.image_size
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(2, s, s, 1).astype(np.float32) * 0.3)
    t = jnp.asarray([1, 0], jnp.int32)
    z = jnp.asarray(rng.randn(2, cfg0.nz).astype(np.float32))

    g1 = NCSNppGenerator(config=cfg8)
    g2 = NCSNppGenerator(config=cfg8, adaptive=True)
    p1 = g1.init(jax.random.PRNGKey(0), x, x, x, x, t, z)["params"]
    p2 = g2.init(
        jax.random.PRNGKey(1), x, x, x, x, t, z, pseudo_target=x
    )["params"]
    post = PosteriorCoefficients.from_config(cfg8)

    batches = [(np.asarray(x), np.asarray(x), np.asarray(x))]
    c1, c2 = calibrate_sampler(
        g1, g2, p1, p2, post, batches, jax.random.PRNGKey(2),
        cfg8.num_timesteps, cfg8.nz, compute_dtype=jnp.float32,
    )
    assert c1.min_ch == max(64, 2 * cfg8.num_channels_dae)
    assert len(c1.sites) > 0 and len(c2.sites) > 0
    for ci, co, a in c1.sites + c2.sites:
        assert len(a) == ci
        assert all(v >= 0.0 for v in a)

    g1s = NCSNppGenerator(config=cfg8, int8_calib=c1)
    g2s = NCSNppGenerator(config=cfg8, adaptive=True, int8_calib=c2)
    g1e = NCSNppGenerator(config=cfg0)
    y_exact = np.asarray(
        g1e.apply({"params": p1}, x, x, x, x, t, z), np.float32
    )
    y_static = np.asarray(
        g1s.apply({"params": p1}, x, x, x, x, t, z), np.float32
    )
    assert np.isfinite(y_static).all()
    assert not np.array_equal(y_exact, y_static)
    assert np.abs(y_exact - y_static).max() <= 0.1

    y2 = np.asarray(
        g2s.apply({"params": p2}, x, x, x, x, t, z, pseudo_target=x),
        np.float32,
    )
    assert np.isfinite(y2).all()
