"""End-to-end integration: tiny train -> checkpoint -> slice test ->
volume prediction -> YAML runner.

Exercises the full stack the way a user would (the reference's workflow:
experiments/run.py -> engine/train.py -> engine/test.py ->
tools/metric_calc.py -> engine/test_volume.py) on a synthetic dataset
small enough for CPU.
"""

import json
import os

import numpy as np
import pytest

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.utils import nifti

TINY = dict(
    image_size=64,
    num_channels=1,
    num_channels_dae=16,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(8,),
    z_emb_dim=32,
    t_emb_dim=32,
    nz=8,
    ngf=8,
    num_timesteps=2,
    batch_size=1,
    num_epoch=1,
    lazy_reg=4,
    log_every=1,
    save_ckpt_every=1,
    save_content_every=1,
    use_bf16=False,
    seed=3,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats")
    rng = np.random.RandomState(0)
    for split, n in (("train", 16), ("val", 8), ("test", 8)):
        d = root / split
        d.mkdir()
        for mod in ("T1", "T2", "FLAIR", "T1CE"):
            np.save(
                d / f"{mod}.npy", rng.randn(n, 64, 64).astype(np.float32)
            )
    return str(root)


@pytest.fixture(scope="module")
def trained(tmp_path_factory, data_root):
    from mudiff_tpu.train.loop import train

    out = tmp_path_factory.mktemp("results")
    cfg = MuDiffConfig(
        input_path=data_root, output_path=str(out), exp="e2e",
        target_modality="T1CE", **TINY,
    )
    artifacts = train(cfg, verbose=False)
    return cfg, artifacts


def test_train_produces_artifacts(trained):
    cfg, artifacts = trained
    exp_dir = artifacts["exp_dir"]
    assert os.path.isdir(os.path.join(exp_dir, "content"))
    assert os.path.isdir(os.path.join(exp_dir, "gen_diffusive_1"))
    assert os.path.isdir(os.path.join(exp_dir, "gen_diffusive_2"))
    with open(artifacts["history"]) as f:
        history = json.load(f)
    assert len(history) == 1
    assert history[0]["val_psnr"] is not None
    assert os.path.isfile(os.path.join(exp_dir, "val_l1_loss.npy"))
    assert os.path.isfile(os.path.join(exp_dir, "val_psnr_values.npy"))


def test_resume_from_content(trained, data_root):
    from mudiff_tpu.train.loop import train

    cfg, artifacts = trained
    cfg2 = cfg.replace(resume=True, num_epoch=2)
    artifacts2 = train(cfg2, verbose=False)
    with open(artifacts2["history"]) as f:
        history = json.load(f)
    # epoch 1 appended after the original epoch 0
    assert history[-1]["epoch"] == 1


def test_slice_test_and_metrics(trained):
    from mudiff_tpu.infer import sample_and_test
    from mudiff_tpu.metrics import evaluate_pair_dirs

    cfg, artifacts = trained
    out = sample_and_test(
        cfg, ckpt_dir=artifacts["exp_dir"], batch_size=4
    )
    assert out["n_slices"] == 8
    assert len(os.listdir(out["pred_dir"])) == 8
    metrics = evaluate_pair_dirs(out["pred_dir"], out["gt_dir"])
    for k in ("psnr", "ssim", "mae"):
        assert np.isfinite(metrics[k]), metrics


def test_volume_prediction(trained, tmp_path):
    from mudiff_tpu.infer import predict_volume

    cfg, artifacts = trained
    rng = np.random.RandomState(5)
    inputs = {}
    affine = np.diag([1.0, 1.0, 2.0, 1.0])
    for m in ("FLAIR", "T2", "T1"):
        vol = np.abs(rng.randn(32, 32, 10).astype(np.float32))
        p = str(tmp_path / f"{m}.nii.gz")
        nifti.save(vol, affine, p)
        inputs[m] = p
    out_path = predict_volume(
        cfg, inputs, str(tmp_path / "volout"),
        ckpt_dir=artifacts["exp_dir"], slice_half_range=2, batch_size=4,
    )
    img = nifti.load(out_path)
    assert img.shape == (32, 32, 10)
    v = img.get_fdata()
    assert np.isfinite(v).all()
    # only the center +-2 slices predicted; others zero-padded
    assert np.allclose(v[:, :, 0], 0)
    assert not np.allclose(v[:, :, 5], 0)
    np.testing.assert_allclose(img.affine[:3], affine[:3], rtol=1e-6)


def test_yaml_runner(tmp_path, data_root):
    """run.py-style YAML experiment (test-only against the trained ckpt
    is covered above; here we validate YAML parsing + config injection)."""
    import yaml

    from mudiff_tpu.cli.run import _config_from_yaml

    doc = {
        "data_path": data_root,
        "output_root": str(tmp_path),
        "experiments": [
            {
                "exp_name": "synthesize_T1CE",
                "target": "T1CE",
                "train_args": {**TINY, "lr_g": 1.6e-4,
                               "num_process_per_node": 2,
                               "port_num": "6021"},
                "test_args": {**TINY, "gpu_chose": 0, "compute_fid": False},
            }
        ],
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(doc))
    with open(p) as f:
        loaded = yaml.safe_load(f)
    exp = loaded["experiments"][0]
    cfg = _config_from_yaml(
        exp["train_args"], loaded["data_path"], loaded["output_root"],
        exp["exp_name"], exp["target"],
    )
    assert cfg.lr_g == pytest.approx(1.6e-4)
    assert cfg.input_path == data_root
    assert cfg.exp == "synthesize_T1CE"
    assert cfg.target_modality == "T1CE"
    # legacy DDP keys ignored without error
    cfg2 = _config_from_yaml(
        exp["test_args"], loaded["data_path"], loaded["output_root"],
        exp["exp_name"], exp["target"],
    )
    assert cfg2.image_size == 64


def test_cli_flag_names_match_reference():
    """Every public reference train flag parses (parity of the CLI
    surface, reference engine/train.py:1318-1446)."""
    from mudiff_tpu.cli.args import parse_config

    argv = (
        "--seed 1024 --image_size 256 --num_channels 1 --use_geometric "
        "--beta_min 0.1 --beta_max 20.0 --num_channels_dae 64 --n_mlp 3 "
        "--ch_mult 1 2 4 --num_res_blocks 2 --attn_resolutions 16 "
        "--dropout 0.0 --resblock_type biggan --progressive none "
        "--progressive_input residual --progressive_combine sum "
        "--embedding_type positional --fourier_scale 16.0 --exp test "
        "--input_path /data --output_path /out --nz 100 --num_timesteps 4 "
        "--z_emb_dim 256 --t_emb_dim 256 --batch_size 2 --num_epoch 30 "
        "--ngf 64 --lr_g 1.6e-4 --lr_d 1e-4 --beta1 0.5 --beta2 0.9 "
        "--use_ema --ema_decay 0.999 --r1_gamma 0.05 --lazy_reg 16 "
        "--save_content_every 1 --save_ckpt_every 10 --lambda_l1_loss 0.5 "
        "--lambda_mask_loss 0.1 --lambda_adv 1.0 --num_proc_node 1 "
        "--num_process_per_node 2 --node_rank 0 --master_address 127.0.0.1 "
        "--port_num 6021 --contrast1 T1 --contrast2 T2 "
        "--target_modality T1CE --use_grad_checkpoint --use_bf16 "
        "--log_every 100 --debug_verbose --resume"
    ).split()
    cfg, args = parse_config(argv, mode="train")
    assert cfg.num_channels_dae == 64
    assert cfg.ch_mult == (1, 2, 4)
    assert cfg.attn_resolutions == (16,)
    assert cfg.lazy_reg == 16
    assert cfg.lambda_adv == 1.0
    assert cfg.target_modality == "T1CE"


def test_cli_grad_checkpoint_policy_plumbs_to_config():
    """--grad_checkpoint_policy (TPU-native knob, PERFORMANCE.md remat
    table) reaches MuDiffConfig for every selective-remat choice."""
    from mudiff_tpu.cli.args import parse_config

    base = ("--exp t --input_path /d --output_path /o "
            "--target_modality T1CE --use_grad_checkpoint").split()
    for pol in ("blocks", "hires", "hires4", "hires8"):
        cfg, _ = parse_config(
            base + ["--grad_checkpoint_policy", pol], mode="train"
        )
        assert cfg.use_grad_checkpoint
        assert cfg.grad_checkpoint_policy == pol


def test_slice_test_multidevice_mesh(trained):
    """Inference shards batches over all 8 virtual devices."""
    import jax

    from mudiff_tpu.infer import sample_and_test

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, artifacts = trained
    out = sample_and_test(
        cfg, ckpt_dir=artifacts["exp_dir"], batch_size=8, use_mesh=True,
        output_dir=os.path.join(artifacts["exp_dir"], "mesh_samples"),
    )
    assert out["n_slices"] == 8


def test_export_png_pairs_shared_range(tmp_path):
    """pred and gt PNGs must share ONE global min/max range (reference
    engine/test.py:370-377): a prediction with a global intensity error
    must NOT be normalized to look identical to the ground truth."""
    from PIL import Image

    from mudiff_tpu.infer.slice_test import export_png_pairs

    gt = np.linspace(0.0, 1.0, 16, dtype=np.float32).reshape(1, 4, 4)
    pred = 0.5 * gt  # contrast-compressed prediction
    pd = tmp_path / "pred"
    gd = tmp_path / "gt"
    pd.mkdir()
    gd.mkdir()
    export_png_pairs(pred, gt, str(pd), str(gd))
    p = np.asarray(Image.open(pd / "pred_00000.png"))
    g = np.asarray(Image.open(gd / "gt_00000.png"))
    assert g.max() == 255
    # shared range keeps the 2x contrast gap visible in the uint8 export
    assert abs(int(p.max()) - 127) <= 1


def test_check_pipeline_keeps_blocked_items_warm(tmp_path):
    """The two environment-blocked capabilities (real BraTS runbook, real
    LPIPS weights) are guarded by pre-flight assertions so code drift
    fails loudly (round-3 verdict #7)."""
    from mudiff_tpu.cli.check_pipeline import (
        check_lpips_hooks,
        check_runbook,
    )

    ok = lambda msg: None
    assert check_lpips_hooks(ok) == []
    assert check_runbook(ok) == []

    # drift MUST be detected: a runbook flag the module stopped declaring
    bad_readme = tmp_path / "README.md"
    bad_readme.write_text(
        "## Reproducing the paper table\n\n```bash\n"
        "python -m mudiff_tpu.cli.metric_calc --pred_dir p --no_such_flag x\n"
        "```\n"
    )
    errs = check_runbook(ok, readme_path=str(bad_readme))
    assert errs and "--no_such_flag" in errs[0]


def test_serving_clis_default_int8_with_bf16_escape():
    """Round-4 serving default: test/test_volume parse use_int8=True
    (--bf16 restores exact); the train parser keeps False (training
    ignores the flag, but the config record should not claim int8)."""
    from mudiff_tpu.cli.args import parse_config

    for mode in ("test", "test_volume"):
        cfg, _ = parse_config([], mode=mode)
        assert cfg.use_int8 is True, mode
        cfg, _ = parse_config(["--bf16"], mode=mode)
        assert cfg.use_int8 is False, mode
        # static/dynamic selection: default auto (None)
        cfg, _ = parse_config([], mode=mode)
        assert cfg.int8_static is None
        cfg, _ = parse_config(["--int8_dynamic"], mode=mode)
        assert cfg.int8_static is False
    cfg, _ = parse_config([], mode="train")
    assert cfg.use_int8 is False


def test_serving_clis_attn_default_and_overrides(monkeypatch):
    """Round-4 serving default: the inference CLIs publish the bf16
    attention lowering via MUDIFF_ATTN (explicit --attn > env > bf16);
    training never touches it (exact einsum parity path)."""
    from mudiff_tpu.cli.args import parse_config

    for mode in ("test", "test_volume"):
        monkeypatch.delenv("MUDIFF_ATTN", raising=False)
        _, args = parse_config([], mode=mode)
        assert args.attn == "bf16"
        assert os.environ["MUDIFF_ATTN"] == "bf16"
        # exported env is the A/B override when no flag is given
        monkeypatch.setenv("MUDIFF_ATTN", "einsum")
        _, args = parse_config([], mode=mode)
        assert args.attn == "einsum"
        # an explicit flag beats the env
        _, args = parse_config(["--attn", "flash"], mode=mode)
        assert args.attn == "flash"
        assert os.environ["MUDIFF_ATTN"] == "flash"
    monkeypatch.delenv("MUDIFF_ATTN", raising=False)
    parse_config([], mode="train")
    assert "MUDIFF_ATTN" not in os.environ
