"""Tests for datasets, loader, NIfTI IO, preprocessing, and metrics."""

import os

import numpy as np
import pytest

from mudiff_tpu.data import BRATS_ORDERS, ISLES_ORDERS, DeviceLoader, SliceDataset
from mudiff_tpu.metrics import mae, psnr, ssim
from mudiff_tpu.utils import nifti


@pytest.fixture()
def npy_root(tmp_path):
    rng = np.random.RandomState(0)
    for split, n in (("train", 20), ("val", 6)):
        d = tmp_path / split
        d.mkdir()
        for mod in ("T1", "T2", "FLAIR", "T1CE"):
            np.save(d / f"{mod}.npy", rng.randn(n, 16, 16).astype(np.float32) * 2)
    return str(tmp_path)


def test_dataset_orders_and_normalization(npy_root):
    ds = SliceDataset("train", npy_root, "T1CE")
    assert ds.modality_order == ["FLAIR", "T2", "T1", "T1CE"]
    assert len(ds) == 20
    cond, target = ds[0]
    assert cond.shape == (16, 16, 3) and target.shape == (16, 16, 1)
    assert cond.min() >= -1.0 and cond.max() <= 1.0
    # clamp semantics: raw value 6 sigma -> exactly 1.0
    raw = ds._data["FLAIR"][0]
    expected = np.clip(raw, -3, 3) / 3.0
    np.testing.assert_allclose(cond[..., 0], expected, rtol=1e-6)


def test_all_brats_orders():
    assert BRATS_ORDERS["T1"] == ["FLAIR", "T1CE", "T2", "T1"]
    assert BRATS_ORDERS["T2"] == ["T1CE", "T1", "FLAIR", "T2"]
    assert BRATS_ORDERS["FLAIR"] == ["T1CE", "T1", "T2", "FLAIR"]
    assert ISLES_ORDERS["FLAIR"][-1] == "FLAIR"
    assert ISLES_ORDERS["T1"] == ["T2", "DWI", "FLAIR", "T1"]


def test_gather_batch(npy_root):
    ds = SliceDataset("train", npy_root, "T2")
    c1, c2, c3, t = ds.gather_batch(np.array([0, 3, 5]))
    assert c1.shape == (3, 16, 16, 1)
    one_c, one_t = ds[3]
    np.testing.assert_allclose(c1[1, ..., 0], one_c[..., 0], rtol=1e-6)
    np.testing.assert_allclose(t[1], one_t, rtol=1e-6)


def test_device_loader(npy_root):
    ds = SliceDataset("train", npy_root, "T1CE")
    loader = DeviceLoader(ds, batch_size=4, seed=7, process_index=0,
                          process_count=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 5 == len(loader)
    c1, c2, c3, t = batches[0]
    assert c1.shape == (4, 16, 16, 1)
    # different epochs shuffle differently
    b0 = np.asarray(batches[0][3])
    b1 = np.asarray(next(iter(loader.epoch(1)))[3])
    assert not np.allclose(b0, b1)


def test_device_loader_multihost_sharding(npy_root):
    ds = SliceDataset("train", npy_root, "T1CE")
    l0 = DeviceLoader(ds, batch_size=2, shuffle=False, process_index=0,
                      process_count=2)
    l1 = DeviceLoader(ds, batch_size=2, shuffle=False, process_index=1,
                      process_count=2)
    i0 = l0._epoch_indices(0)
    i1 = l1._epoch_indices(0)
    assert set(i0).isdisjoint(set(i1))
    assert len(i0) + len(i1) == 20


def test_nifti_roundtrip(tmp_path):
    vol = np.random.RandomState(0).randn(9, 11, 13).astype(np.float32)
    affine = np.diag([2.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = [-10, 5, 2]
    p = str(tmp_path / "vol.nii.gz")
    nifti.save(vol, affine, p)
    img = nifti.load(p)
    np.testing.assert_allclose(img.get_fdata(), vol, rtol=1e-6)
    np.testing.assert_allclose(img.affine[:3], affine[:3], rtol=1e-6)
    # .nii (uncompressed) too
    p2 = str(tmp_path / "vol.nii")
    nifti.save(img, path=p2)
    np.testing.assert_allclose(nifti.load(p2).get_fdata(), vol, rtol=1e-6)


def test_nifti_scl_slope(tmp_path):
    import struct

    vol = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    p = str(tmp_path / "v.nii")
    nifti.save(vol, np.eye(4), p)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<2f", raw, 112, 2.0, 1.0)  # slope=2, inter=1
    open(p, "wb").write(raw)
    out = nifti.load(p).get_fdata()
    np.testing.assert_allclose(out, vol * 2 + 1, rtol=1e-6)


def test_preprocess_pipeline(tmp_path):
    from mudiff_tpu.data.preprocess import preprocess

    rng = np.random.RandomState(1)
    raw = tmp_path / "raw"
    for pid in ("BraTS-001", "BraTS-002", "BraTS-003"):
        d = raw / pid
        d.mkdir(parents=True)
        for kw in ("t1n", "t1c", "t2w", "t2f"):
            vol = rng.rand(12, 10, 9).astype(np.float32) * 100
            vol[:2] = 0  # background
            nifti.save(vol, np.eye(4), str(d / f"{pid}-{kw}.nii.gz"))
    out = preprocess(
        str(raw), str(tmp_path / "out"), half_range=2, seed=0,
        train_ratio=0.67, val_ratio=0.0,
    )
    tr = np.load(out["train"]["T1"])
    assert tr.ndim == 3 and tr.shape[1:] == (12, 10)
    assert tr.shape[0] == 2 * 5  # 2 train patients x (2*2+1) slices
    # z-scored over nonzero voxels: brain mean ~0
    assert abs(tr[tr != tr[0, 0, 0]].mean()) < 1.0


def test_psnr_ssim_mae():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64).astype(np.float32)
    assert psnr(img, img) == float("inf")
    assert ssim(img, img) == pytest.approx(1.0)
    assert mae(img, img) == 0.0
    noisy = np.clip(img + rng.randn(64, 64) * 0.1, 0, 1).astype(np.float32)
    p = psnr(img, noisy)
    assert 15 < p < 25
    s = ssim(img, noisy)
    assert 0.0 < s < 1.0
    # PSNR definition check: 10*log10(1/mse)
    mse = np.mean((img.astype(np.float64) - noisy) ** 2)
    assert p == pytest.approx(10 * np.log10(1.0 / mse), rel=1e-6)


def test_loader_shards_stay_in_lockstep(npy_root):
    """All hosts must see the same number of batches even when the
    dataset size is not divisible by the process count (review finding:
    differing shard sizes would desync the SPMD program)."""
    from mudiff_tpu.data import SliceDataset

    ds = SliceDataset("train", npy_root, "T1CE")  # 20 slices
    # 3 processes: 20/3 -> floor 6 per shard; global batch 6 -> 2 local
    lens = []
    for pi in range(3):
        l = DeviceLoader(ds, batch_size=6, shuffle=False,
                         process_index=pi, process_count=3)
        assert l.local_batch_size == 2
        idx = l._epoch_indices(0)
        lens.append(len(idx))
        assert len(l) == 3  # 6 shard rows // 2 local rows per batch
    assert len(set(lens)) == 1


def test_loader_abandoned_iterator_does_not_leak(npy_root):
    """Dropping an epoch iterator mid-way must unblock the producer
    thread (review finding: q.put could block forever)."""
    import threading
    import time

    from mudiff_tpu.data import SliceDataset

    before = threading.active_count()
    ds = SliceDataset("train", npy_root, "T1CE")
    loader = DeviceLoader(ds, batch_size=2, process_index=0, process_count=1)
    it = loader.epoch(0)
    next(it)  # start producer, take one batch
    it.close()  # abandon
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_nifti_rejects_detached_pair(tmp_path):
    import struct

    vol = np.zeros((2, 2, 2), np.float32)
    p = str(tmp_path / "v.nii")
    nifti.save(vol, np.eye(4), p)
    raw = bytearray(open(p, "rb").read())
    raw[344:348] = b"ni1\x00"
    open(p, "wb").write(raw)
    with pytest.raises(ValueError, match="detached"):
        nifti.load(p)


def test_wrapper_modality_patterns():
    """BraTS-2023 naming: -t2f is FLAIR, -t2w is T2 (review finding:
    backtracking regex mis-assigned t2f to T2)."""
    from mudiff_tpu.cli.predict_volume_wrapper import find_modality_files

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        for n in ("sub-t1n.nii.gz", "sub-t1c.nii.gz", "sub-t2w.nii.gz",
                  "sub-t2f.nii.gz"):
            open(os.path.join(d, n), "w").close()
        found = find_modality_files(d)
        assert found["FLAIR"].endswith("t2f.nii.gz")
        assert found["T2"].endswith("t2w.nii.gz")
        assert found["T1CE"].endswith("t1c.nii.gz")
        assert found["T1"].endswith("t1n.nii.gz")


def test_nifti_big_endian_source_header(tmp_path):
    """Saving with a big-endian source header must produce a pure
    little-endian output file (geometry carried over), not a
    mixed-endian header."""
    import struct

    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    pixdim = (1.5, 2.5, 3.5)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 16)  # float32
    struct.pack_into(">h", hdr, 72, 32)  # bitpix
    struct.pack_into(">8f", hdr, 76, 0.0, *pixdim, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(">f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "be.nii")
    with open(p, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4 + vol.astype(">f4").tobytes(order="F"))

    img = nifti.load(p)
    np.testing.assert_allclose(img.get_fdata(), vol)
    p2 = str(tmp_path / "out.nii")
    nifti.save(img, path=p2)
    with open(p2, "rb") as f:
        out_hdr = f.read(348)
    assert struct.unpack_from("<i", out_hdr, 0)[0] == 348  # LE sizeof_hdr
    out_pixdim = struct.unpack_from("<8f", out_hdr, 76)[1:4]
    np.testing.assert_allclose(out_pixdim, pixdim, rtol=1e-6)
    np.testing.assert_allclose(nifti.load(p2).get_fdata(), vol)


def test_device_loader_two_process_assembly():
    """Real 2-process jax.distributed CPU cluster: DeviceLoader must
    assemble per-host local shards into correct GLOBAL batches via
    jax.make_array_from_process_local_data (device_put of a host-local
    global-size array is wrong on multi-host)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH="/root/repo",
        OMP_NUM_THREADS="1",
    )
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(p)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(2)
    ]
    outs = []
    for p, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=600)
        outs.append(out)
        assert proc.returncode == 0, f"worker {p} failed:\n{out}"
        assert f"WORKER_{p}_OK" in out, out
    # both processes observed the same global batches
    line0 = [l for l in outs[0].splitlines() if "WORKER_0_OK" in l][0]
    line1 = [l for l in outs[1].splitlines() if "WORKER_1_OK" in l][0]
    assert line0.split("OK")[1] == line1.split("OK")[1]
