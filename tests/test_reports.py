"""Tests for observability utilities (reports, profiling timers)."""

import json
import os

import numpy as np

from mudiff_tpu.utils.profiling import StepTimer, device_memory_stats
from mudiff_tpu.utils.reports import (
    append_history,
    epoch_visual_report,
    plot_evolution,
    save_collage,
    save_image_grid,
)


def test_save_image_grid(tmp_path):
    imgs = np.random.RandomState(0).rand(6, 16, 16, 1).astype(np.float32)
    p = str(tmp_path / "grid.png")
    save_image_grid(imgs, p, ncol=3)
    from PIL import Image

    g = Image.open(p)
    assert g.size[0] > 3 * 16 and g.size[1] > 2 * 16


def test_history_and_plots(tmp_path):
    hp = str(tmp_path / "training_history.json")
    for ep in range(3):
        append_history(hp, {
            "epoch": ep,
            "losses": {"G_total": 2.0 - 0.1 * ep, "D_total": 1.9},
            "val_l1": 0.1 / (ep + 1),
            "val_psnr": 20.0 + ep,
            "epoch_time": 5.0,
        })
    with open(hp) as f:
        hist = json.load(f)
    assert [h["epoch"] for h in hist] == [0, 1, 2]
    plot_evolution(hp, str(tmp_path))
    assert os.path.isfile(tmp_path / "training_evolution.png")
    # corrupted history file is tolerated (append resets)
    with open(hp, "w") as f:
        f.write("{broken")
    append_history(hp, {"epoch": 9, "losses": {}, "val_l1": None,
                        "val_psnr": None, "epoch_time": 1.0})
    with open(hp) as f:
        assert json.load(f)[0]["epoch"] == 9


def test_epoch_visual_report(tmp_path):
    reals = np.random.RandomState(0).randn(4, 16, 16, 1).astype(np.float32)
    fakes = np.random.RandomState(1).randn(4, 16, 16, 1).astype(np.float32)
    epoch_visual_report(
        exp_dir=str(tmp_path), epoch=0,
        losses={"G_total": 1.0}, val_l1=0.1, val_psnr=20.0, epoch_time=2.0,
        samples=fakes, reals=reals,
    )
    assert os.path.isfile(tmp_path / "training_history.json")
    assert os.path.isfile(tmp_path / "collage_epoch_0.png")


def test_step_timer():
    import time

    t = StepTimer()
    time.sleep(0.02)
    t.mark_data_ready()
    time.sleep(0.01)
    t.mark_step_done()
    assert t.data_time >= 0.02
    assert t.window() >= 0.03


def test_device_memory_stats_shape():
    stats = device_memory_stats()  # may be empty on CPU backends
    for dev, s in stats.items():
        assert "bytes_in_use_gib" in s
