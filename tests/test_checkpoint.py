"""Checkpoint roundtrip and config serialization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudiff_tpu.config import MuDiffConfig, brats_recipe
from mudiff_tpu.train import create_train_state
from mudiff_tpu.train import checkpoint as ckpt

TINY = MuDiffConfig(
    image_size=64, num_channels=1, num_channels_dae=16, ch_mult=(1, 2),
    num_res_blocks=1, attn_resolutions=(8,), z_emb_dim=32, t_emb_dim=32,
    nz=8, ngf=8, num_timesteps=2, use_bf16=False, use_ema=True,
    ema_decay=0.9,
)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def state():
    s, *_ = create_train_state(TINY, jax.random.PRNGKey(0), steps_per_epoch=5)
    return s


def test_content_roundtrip(tmp_path, state):
    ckpt.save_content(str(tmp_path), state, epoch=3, global_step=42)
    s2, *_ = create_train_state(TINY, jax.random.PRNGKey(7), steps_per_epoch=5)
    restored, epoch, step = ckpt.restore_content(str(tmp_path), s2)
    assert epoch == 3 and step == 42
    _tree_equal(restored.params_g1, state.params_g1)
    _tree_equal(restored.params_g2, state.params_g2)
    _tree_equal(restored.params_d, state.params_d)
    _tree_equal(restored.opt_g1, state.opt_g1)
    _tree_equal(restored.ema_g1, state.ema_g1)
    _tree_equal(restored.att_conv, state.att_conv)


def test_generator_only_checkpoints(tmp_path, state):
    p1, p2 = ckpt.save_generators(
        str(tmp_path), state, epoch=5, use_ema_weights=True
    )
    loaded = ckpt.load_generator_params(
        str(tmp_path), "gen_diffusive_1", state.params_g1
    )
    # use_ema=True -> saved weights are the EMA shadow
    _tree_equal(loaded, state.ema_g1)
    # epoch-tagged copy exists
    loaded5 = ckpt.load_generator_params(
        str(tmp_path), "gen_diffusive_1_5", state.params_g1
    )
    _tree_equal(loaded5, state.ema_g1)


def test_load_with_fallback_dir(tmp_path, state):
    primary = tmp_path / "empty"
    primary.mkdir()
    fallback = tmp_path / "fb"
    fallback.mkdir()
    ckpt.save_generators(str(fallback), state, use_ema_weights=False)
    loaded = ckpt.load_generator_params(
        str(primary), "gen_diffusive_2", state.params_g2,
        fallback_dir=str(fallback),
    )
    _tree_equal(loaded, state.params_g2)
    with pytest.raises(FileNotFoundError):
        ckpt.load_generator_params(
            str(primary), "gen_diffusive_1", state.params_g1
        )


def test_config_roundtrip():
    cfg = brats_recipe(target_modality="T2", lazy_reg=16)
    d = cfg.to_dict()
    cfg2 = MuDiffConfig.from_dict(d)
    assert cfg2 == cfg
    # unknown keys are ignored (YAML forward-compat)
    cfg3 = MuDiffConfig.from_dict({**d, "gpu_chose": 0, "compute_fid": False})
    assert cfg3 == cfg


def test_loader_propagates_worker_errors(tmp_path):
    """An exception in the producer thread must surface to the consumer."""
    import numpy as np

    from mudiff_tpu.data import DeviceLoader

    class Broken:
        def __len__(self):
            return 8

        image_shape = (4, 4)

        def gather_batch(self, idx):
            raise RuntimeError("boom")

    loader = DeviceLoader(
        Broken(), batch_size=2, process_index=0, process_count=1
    )
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(loader.epoch(0)))


def test_restore_like_matches_by_key_path(tmp_path):
    """Leaves must be matched by key path, not flattened order: a
    container whose field order differs from sorted dict-key order
    (zeta before alpha) would silently swap same-shaped leaves under
    order-based unflattening."""
    import collections

    S = collections.namedtuple("S", ["zeta", "alpha"])
    template = {"opt": S(zeta=np.zeros((3,), np.float32),
                         alpha=np.zeros((3,), np.float32))}
    value = {"opt": S(zeta=np.full((3,), 1.0, np.float32),
                      alpha=np.full((3,), 2.0, np.float32))}
    path = tmp_path / "nt"
    ckpt._ckptr().save(str(path), value, force=True)
    restored = ckpt._restore_like(template, ckpt._ckptr().restore(str(path)))
    np.testing.assert_array_equal(np.asarray(restored["opt"].zeta), 1.0)
    np.testing.assert_array_equal(np.asarray(restored["opt"].alpha), 2.0)
