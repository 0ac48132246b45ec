"""Slice datasets over preprocessed .npy stacks.

Parity source: dataset/dataset_brats.py (ORDERS:29-34, loading:53-66,
normalization clamp(+-3sigma)/3:83,91).  The reference lacks the ISLES
dataset class its README promises (README.md:71 references a
dataset_isles.py that does not exist); we ship it with the modality
orders documented at README.md:81.

Pure numpy — no torch Dataset/DataLoader machinery.  Slices are stored
z-scored (see preprocess.py); __getitem__ clamps to +-3 sigma and divides
by 3, yielding [-1, 1] images in NHWC.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

BRATS_ORDERS: Dict[str, List[str]] = {
    "T1CE": ["FLAIR", "T2", "T1", "T1CE"],
    "FLAIR": ["T1CE", "T1", "T2", "FLAIR"],
    "T2": ["T1CE", "T1", "FLAIR", "T2"],
    "T1": ["FLAIR", "T1CE", "T2", "T1"],
}

# ISLES2015: conditions -> target per reference README.md:81
# ([T1, T2, DWI] -> FLAIR; [T2, DWI, FLAIR] -> T1).
ISLES_ORDERS: Dict[str, List[str]] = {
    "FLAIR": ["T1", "T2", "DWI", "FLAIR"],
    "T1": ["T2", "DWI", "FLAIR", "T1"],
}


class SliceDataset:
    """Multi-contrast slice dataset: 3 condition slices + 1 target slice.

    Parameters mirror the reference BratsDataset; ``orders`` selects the
    dataset family (BRATS_ORDERS / ISLES_ORDERS).
    """

    def __init__(
        self,
        split: str = "train",
        base_path: str = "data/BRATS",
        target_modality: str = "T1CE",
        use_mmap: bool = False,
        orders: Dict[str, List[str]] = None,
    ) -> None:
        orders = orders or BRATS_ORDERS
        if target_modality not in orders:
            raise ValueError(
                f"Invalid target_modality {target_modality}; "
                f"choose from {sorted(orders)}"
            )
        self.split = split
        self.base_path = base_path
        self.modality_order = orders[target_modality]
        self._data: Dict[str, np.ndarray] = {}
        for mod in self.modality_order:
            fp = os.path.join(base_path, split, f"{mod}.npy")
            if not os.path.isfile(fp):
                raise FileNotFoundError(fp)
            arr = np.load(fp, mmap_mode="r" if use_mmap else None)
            if not use_mmap:
                arr = np.ascontiguousarray(arr, dtype=np.float32)
            self._data[mod] = arr
        self.length = self._data[self.modality_order[0]].shape[0]
        shp = self._data[self.modality_order[0]].shape
        self.image_shape = (shp[1], shp[2])

    def __len__(self) -> int:
        return self.length

    @staticmethod
    def normalize(x: np.ndarray) -> np.ndarray:
        """z-score -> [-1, 1]: clamp to +-3 sigma, divide by 3
        (reference dataset_brats.py:83)."""
        return np.clip(x, -3.0, 3.0) / 3.0

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Return (cond_stack [H,W,3], target [H,W,1]) in NHWC order."""
        conds = [
            self.normalize(self._data[m][idx].astype(np.float32))
            for m in self.modality_order[:-1]
        ]
        target = self.normalize(
            self._data[self.modality_order[-1]][idx].astype(np.float32)
        )
        return np.stack(conds, axis=-1), target[..., None]

    def gather_batch(
        self, indices: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized batch assembly: (c1, c2, c3, target), each
        (B, H, W, 1) float32 in [-1, 1].  Served by the native C++
        gather (native/slice_gather.cpp) when built; numpy otherwise
        (bit-identical)."""
        from mudiff_tpu.data import _native

        sources = tuple(self._data[m] for m in self.modality_order)
        return _native.gather_normalize4(sources, np.asarray(indices))
