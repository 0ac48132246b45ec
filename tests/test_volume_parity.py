"""Golden parity of the volume-inference path vs the reference functions.

Imports ``engine/test_volume.py`` from the read-only reference checkout
(the same way tests/test_torch_parity.py imports ``backbones/``) and
compares our ``infer/volume.py`` preprocessing, slice extraction, resize
and reassembly against it on synthetic volumes (round-2 verdict #7;
reference engine/test_volume.py:135-181, :269-276).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "engine")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

# engine/test_volume.py does `import nibabel as nib` at module level but
# the functions under test never touch it; this image has no nibabel.
# The stub needs the attribute names used in annotations/signatures.
if "nibabel" not in sys.modules:
    _nib_stub = types.ModuleType("nibabel")
    for _name in ("Nifti1Header", "Nifti1Image"):
        setattr(_nib_stub, _name, type(_name, (), {}))
    _nib_stub.load = _nib_stub.save = None
    sys.modules["nibabel"] = _nib_stub

from engine import test_volume as ref_vol  # noqa: E402

from mudiff_tpu.infer.volume import (  # noqa: E402
    _bilinear_resize,
    _slice_bounds,
    reconstruct_volume_from_slices,
    robust_minmax_to_minus1_1,
)


def _volumes():
    rng = np.random.RandomState(0)
    base = rng.rand(31, 37, 19).astype(np.float32) * 900.0
    base[base < 200] = 0.0  # background zeros (brain-mask semantics)
    spiky = base.copy()
    spiky[5, 5, 5] = 1e6  # outlier the percentile window must clip
    return {
        "random": base,
        "outlier": spiky,
        "all_zero": np.zeros((8, 8, 8), np.float32),
        "constant": np.full((8, 8, 8), 7.0, np.float32),
        "negative": rng.randn(16, 16, 9).astype(np.float32) * 50.0,
    }


def test_robust_minmax_parity():
    for name, vol in _volumes().items():
        ours = robust_minmax_to_minus1_1(vol)
        theirs = ref_vol.robust_minmax_to_minus1_1(vol)
        np.testing.assert_allclose(ours, theirs, atol=1e-6, err_msg=name)


def test_center_slice_extraction_parity():
    rng = np.random.RandomState(1)
    for depth in (9, 10, 160, 3):
        vol = rng.rand(12, 12, depth).astype(np.float32)
        for half in (2, 80):
            ref_slices, ref_s0, ref_s1 = ref_vol.extract_center_slices(
                vol, half
            )
            s0, s1 = _slice_bounds(depth, half)
            assert (s0, s1) == (ref_s0, ref_s1), (depth, half)
            ours = [vol[:, :, z] for z in range(s0, s1 + 1)]
            assert len(ours) == len(ref_slices)
            for a, b in zip(ours, ref_slices):
                np.testing.assert_array_equal(a, b)


def test_reconstruct_volume_parity():
    rng = np.random.RandomState(2)
    shape = (21, 23, 15)
    s0, s1 = _slice_bounds(shape[2], 4)
    predicted = [
        rng.rand(*shape[:2]).astype(np.float32) for _ in range(s1 - s0 + 1)
    ]
    ours = reconstruct_volume_from_slices(list(predicted), shape, s0, s1)
    theirs = ref_vol.reconstruct_volume_from_slices(
        list(predicted), shape, s0, s1
    )
    np.testing.assert_array_equal(ours, theirs)
    # zero padding outside the predicted band
    assert np.all(ours[:, :, :s0] == 0) and np.all(ours[:, :, s1 + 1:] == 0)


def test_slice_resize_matches_torch_interpolate():
    """Per-slice bilinear resize: jax.image.resize('bilinear') must match
    the reference's F.interpolate(..., mode='bilinear',
    align_corners=False) (engine/test_volume.py:275) — both use
    half-pixel-center sampling."""
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    for hw in ((37, 37), (64, 64), (31, 31)):
        sl = rng.rand(*hw).astype(np.float32) * 2 - 1
        ours = _bilinear_resize(sl, 48)
        t = torch.from_numpy(sl)[None, None]
        theirs = (
            F.interpolate(t, size=(48, 48), mode="bilinear",
                          align_corners=False)
            .numpy()[0, 0]
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)
